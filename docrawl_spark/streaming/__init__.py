"""Structured-Streaming surface: incremental crawl waves and
streaming telemetry rollups."""

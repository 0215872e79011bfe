"""Dataflow operators for the crawl engine.

Each operator is a pure DataFrame→DataFrame function (no session state,
no actions inside) so Catalyst sees one logical plan per wave and can
push filters/prune columns across operator boundaries.
"""

"""Plans: the wave-loop crawl driver and the reference-semantics simulator."""

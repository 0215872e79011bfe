"""docrawl_spark — a PySpark-native rebuild of docrawl's crawl engine.

A distributed URL-frontier + fetch scheduler (Bloom-prefiltered URL-seen
set, politeness-aware per-host priority selection, robots gating) over
tables of interleaved text+media span documents, built Spark-first:
every stage is a declarative DataFrame pipeline; all per-row computation
is vectorized (built-in ``pyspark.sql.functions`` or Arrow-batched
pandas UDFs) — zero per-row Python.

Reference semantics: DovaX/docrawl (see SURVEY.md for file:line maps).
This is NOT a port — the reference remote-controls one Selenium browser
sequentially; this package re-expresses what it computes as batch
dataflow that scales to a 10^10-URL frontier.

Layout:
  functions/  vectorized scalar functions (URL canonicalization, hashing,
              text cleaning) — the UDF surface
  operators/  dataflow operators (link extraction, dedup, politeness,
              extraction kernel)
  sources/    storage (snapshot-versioned warehouse), fixture generator
  plans/      wave-loop driver (crawl pipeline assembly), simulator
  streaming/  structured-streaming frontier (incremental waves)
  datapipe/   large-scale training-data ops (dedup family, ANN,
              text quality, multimodal plumbing)
"""

__version__ = "0.1.0"

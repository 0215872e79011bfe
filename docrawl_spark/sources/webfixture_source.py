"""Python Data Source (Spark 4 API) for the deterministic web fixture.

Exposes the synthetic span-document corpus as a real
``spark.read.format("webfixture")`` source instead of a driver-side
``createDataFrame``:

    spark.dataSource.register(WebFixtureDataSource)
    docs = (spark.read.format("webfixture")
            .option("seed", 7).option("n_hosts", 6).load())

Reads are partitioned BY HOST (one InputPartition per host), so the
scan parallelizes the way a production crawl store would (host-bucketed
Iceberg files): each task regenerates the deterministic fixture and
emits only its host's documents. At fixture scale regeneration is
microseconds; the pattern to copy at real scale is per-partition
deterministic generation, not a driver-side broadcast of the corpus.

This is the engine's "custom source" exhibit (SURVEY.md §2.5 scans
row): the reference's only inputs are live browser navigations
(docrawl_core.py:1050-1062) — a rebuild source instead declares
schema + partitions and lets Spark schedule the scan.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


class HostPartition(InputPartition):
    def __init__(self, host: str):
        self.host = host


class WebFixtureReader(DataSourceReader):
    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        self.n_hosts = int(options.get("n_hosts", 6))
        self.pages_cold = int(options.get("pages_cold", 6))
        self.pages_hot = int(options.get("pages_hot", 18))
        self.n_seeds = int(options.get("n_seeds", 5))
        self.raw = str(options.get("raw", "true")).lower() != "false"

    def _fixture(self):
        from docrawl_spark.sources.fixtures import generate_web

        return generate_web(
            n_hosts=self.n_hosts,
            pages_cold=self.pages_cold,
            pages_hot=self.pages_hot,
            seed=self.seed,
            n_seeds=self.n_seeds,
        )

    def partitions(self):
        # enumerate hosts FROM the fixture (no duplicated naming scheme)
        return [HostPartition(h["host"]) for h in self._fixture().hosts]

    def read(self, partition: HostPartition):
        from urllib.parse import urlsplit

        docs = (
            self._fixture().documents_raw if self.raw else self._fixture().documents
        )
        for url, spans in docs.items():
            # parsed-netloc match (not substring) so root urls without a
            # trailing path still land in their host's partition
            if urlsplit(url).netloc.lower() == partition.host:
                yield (
                    url,
                    [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans],
                )


class WebFixtureDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "webfixture"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> WebFixtureReader:
        return WebFixtureReader(self.options)

"""Snapshot-versioned warehouse — the sandbox stand-in for Iceberg.

Production target is Iceberg (``df.writeTo(...).append()``, ``MERGE
INTO``, snapshot time-travel as the checkpoint mechanism — SURVEY.md
§1.2). The sandbox image has no Iceberg jars, so this module implements
the same *commit semantics* on plain parquet:

- a table = a directory of immutable snapshot delta-dirs + an atomic
  JSON manifest (write-temp + rename) naming the committed snapshots;
- ``append`` = write a new delta-dir, commit manifest;
- ``overwrite`` = write a new delta-dir, commit manifest with only it;
- ``read(as_of=...)`` = union of delta-dirs committed up to that
  snapshot — time travel;
- readers never see uncommitted data (crash between write and manifest
  rename = clean rollback), which is exactly the wave-checkpoint
  guarantee the crawl loop needs.

Swapping this for real Iceberg is a constructor change, not a pipeline
change: every caller goes through Warehouse.append/overwrite/read.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class Warehouse:
    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _mpath(self, table: str) -> str:
        return os.path.join(self.root, table, "_manifest.json")

    def _load_manifest(self, table: str) -> dict:
        p = self._mpath(table)
        if not os.path.exists(p):
            return {"snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _commit_manifest(self, table: str, manifest: dict) -> None:
        p = self._mpath(table)
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, p)  # atomic commit

    # -- writes ------------------------------------------------------------
    def _write_snapshot(self, table: str, df: DataFrame) -> str:
        snap_id = uuid.uuid4().hex[:12]
        path = os.path.join(self.root, table, f"snap-{snap_id}")
        df.write.mode("errorifexists").parquet(path)
        return snap_id

    def append(self, table: str, df: DataFrame) -> str:
        snap_id = self._write_snapshot(table, df)
        m = self._load_manifest(table)
        m["snapshots"].append({"id": snap_id, "mode": "append"})
        self._commit_manifest(table, m)
        return snap_id

    def overwrite(self, table: str, df: DataFrame) -> str:
        snap_id = self._write_snapshot(table, df)
        m = self._load_manifest(table)
        m["snapshots"].append({"id": snap_id, "mode": "overwrite"})
        self._commit_manifest(table, m)
        return snap_id

    def merge_upsert(self, table: str, df: DataFrame, key_cols: list[str]) -> str:
        """``MERGE INTO`` semantics (SURVEY.md §1.2: the url_seen upsert
        on real Iceberg): rows in ``df`` replace current rows with the
        same key, new keys append. Implemented as anti-join + union into
        ONE new overwrite snapshot — readers see pre- or post-merge
        state, never partial (same atomicity as append/overwrite)."""
        if self.exists(table):
            cur = self.read(table)
            kept = cur.join(df.select(*key_cols).distinct(), key_cols, "left_anti")
            merged = kept.unionByName(df)
        else:
            merged = df
        return self.overwrite(table, merged)

    # -- reads -------------------------------------------------------------
    def snapshot_ids(self, table: str) -> list[str]:
        return [s["id"] for s in self._load_manifest(table)["snapshots"]]

    def read(
        self,
        table: str,
        as_of: str | None = None,
        empty_schema: T.StructType | None = None,
    ) -> DataFrame:
        """Current (or time-travel ``as_of`` snapshot id) table state."""
        snaps = self._load_manifest(table)["snapshots"]
        if as_of is not None:
            idx = next(i for i, s in enumerate(snaps) if s["id"] == as_of)
            snaps = snaps[: idx + 1]
        # honor overwrites: keep only deltas after the last overwrite
        live: list[dict] = []
        for s in snaps:
            if s["mode"] == "overwrite":
                live = [s]
            else:
                live.append(s)
        if not live:
            if empty_schema is None:
                raise ValueError(f"table {table} is empty and no schema given")
            return self.spark.createDataFrame([], empty_schema)
        paths = [os.path.join(self.root, table, f"snap-{s['id']}") for s in live]
        return self.spark.read.parquet(*paths)

    def exists(self, table: str) -> bool:
        return bool(self._load_manifest(table)["snapshots"])

"""Stateful per-host politeness in streaming mode — the crawl_delay
half of the politeness policy, which batch waves encode implicitly
(budget per wave) but a continuous frontier must track as STATE.

``rate_limited_release``: a streaming candidate feed grouped by host;
state per host = (window_start_epoch, released_in_window). Each
micro-batch releases at most ``budget`` urls per host per
``window_s``-second window, lowest priority value first; the rest are
dropped (they re-enter via the frontier, mirroring the batch
budget-drop semantics). Implemented with ``applyInPandasWithState`` —
the custom-stateful-operator escape hatch when windows/dropDuplicates
can't express the semantics.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RELEASE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("priority", T.LongType()),
        T.StructField("released_in_window", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.DoubleType()),
        T.StructField("released", T.IntegerType()),
    ]
)


def make_release_fn(budget: int, window_s: float, clock=time.monotonic):
    """Build the stateful release function (clock injectable for
    deterministic tests)."""

    def release(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        now = float(clock())
        if state.exists:
            window_start, released = state.get
        else:
            window_start, released = now, 0
        if now - window_start >= window_s:
            window_start, released = now, 0
        remaining = max(0, budget - released)

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["priority", "url"], kind="mergesort")
        out = batch.head(remaining)
        released += len(out)
        state.update((window_start, released))
        yield pd.DataFrame(
            {
                "host": out["host"],
                "url": out["url"],
                "priority": out["priority"],
                "released_in_window": released,
            }
        )

    return release


def rate_limited_release(
    candidates_stream: DataFrame,
    budget: int = 4,
    window_s: float = 60.0,
    clock=time.monotonic,
) -> DataFrame:
    """candidate stream (host, url, priority) → released stream,
    ≤ budget per host per window."""
    return (
        candidates_stream.groupBy("host")
        .applyInPandasWithState(
            make_release_fn(budget, window_s, clock),
            RELEASE_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas twin (same semantics, modern API)
# ---------------------------------------------------------------------------


def rate_limited_release_tws(
    candidates_stream: DataFrame,
    budget: int = 4,
    window_s: float = 60.0,
    clock=time.monotonic,
) -> DataFrame:
    """``rate_limited_release`` built on Spark 4's
    ``transformWithStateInPandas`` (requires the RocksDB state store:
    spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider) — identical output contract.

    NB: the TWS Python runner needs the ``protobuf`` wheel (its state
    server protocol); this sandbox image lacks it, so the equality test
    auto-skips here and runs on a normally-provisioned cluster. The
    applyInPandasWithState twin above is the container-tested path."""
    from pyspark.sql.streaming import StatefulProcessor

    class HostBudgetProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._win = handle.getValueState("win", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            now = float(clock())
            if self._win.exists():
                window_start, released = self._win.get()
            else:
                window_start, released = now, 0
            if now - window_start >= window_s:
                window_start, released = now, 0
            remaining = max(0, budget - int(released))
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(["priority", "url"], kind="mergesort")
            out = batch.head(remaining)
            released = int(released) + len(out)
            self._win.update((float(window_start), released))
            # never yield an empty object-dtype frame: the TWS Arrow
            # serializer can fail schema coercion on untyped empty
            # batches (path only exercisable on a provisioned cluster —
            # this container lacks protobuf)
            if len(out):
                yield pd.DataFrame(
                    {
                        "host": out["host"],
                        "url": out["url"],
                        "priority": out["priority"],
                        "released_in_window": released,
                    }
                )

        def close(self) -> None:
            pass

    return candidates_stream.groupBy("host").transformWithStateInPandas(
        statefulProcessor=HostBudgetProcessor(),
        outputStructType=RELEASE_SCHEMA,
        outputMode="append",
        timeMode="none",
    )

"""Custom stateful streaming operators (applyInPandasWithState).

The reference's streaming layer is stateless processing-time
micro-batching (/root/reference/awsglue/context.py:553-664); these are
the engine's documented stateful extensions. State is partitioned by
group key, so at any scale each executor holds only its keys' state;
with a TTL-style timeout the store is bounded even on unbounded key
cardinality.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_dedup(df: DataFrame, key_col: str) -> DataFrame:
    """Exactly-once-per-key emission across the whole stream: the first
    row of each ``key_col`` group ever seen is emitted; every later
    occurrence — same micro-batch or any later one — is dropped. State
    per key is a single marker, the minimum possible (a dedup over a
    100 TB stream stores one bit per distinct key, sharded by the
    grouping hash).

    Use a content fingerprint (text.fingerprint_xxhash) as the key for
    streaming near-real-time dedup of a document feed.
    """
    schema = df.schema

    def emit_first(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        for pdf in pdfs:
            if len(pdf):
                state.update((True,))
                yield pdf.iloc[:1]
                return

    return df.groupBy(key_col).applyInPandasWithState(
        emit_first,
        outputStructType=schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_running_counts(df: DataFrame, key_col: str) -> DataFrame:
    """Running per-key counts emitted each micro-batch — the canonical
    stateful aggregation, one long per key of state."""

    def count_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev = state.get[0] if state.exists else 0
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        total = prev + batch
        state.update((total,))
        yield pd.DataFrame({"key": [key[0]], "n": [total]})

    return df.groupBy(key_col).applyInPandasWithState(
        count_group,
        outputStructType="key string, n long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_running_counts_tws(
    df: DataFrame, key_col: str, state_ttl_ms: int | None = None
) -> DataFrame:
    """Running per-key counts on Spark 4's ``transformWithStateInPandas``
    — the successor API to ``applyInPandasWithState`` and the
    forward path for custom stateful operators: typed state variables
    (value/list/map) instead of one tuple, per-state TTL, and timers.

    ``state_ttl_ms`` bounds the store on unbounded key cardinality the
    declarative way: a key idle longer than the TTL is evicted by the
    state store itself (no timeout plumbing in the operator body), and
    a late arrival after eviction simply restarts its count — the
    documented trade of bounded state for windowed exactness. Output
    schema: (key string, n long), update semantics per micro-batch.

    Deployment requirements (both raise clearly when absent): the
    RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) and google.protobuf
    in the Python workers (the TWS state channel is protobuf-framed).
    applyInPandasWithState operators above have no such dependencies
    and remain the portable path."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", "n bigint", state_ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            for pdf in rows:
                n += len(pdf)
            prev = self._count.get()
            total = (prev[0] if prev is not None else 0) + n
            self._count.update((total,))
            # key passes through unmodified (None stays None; the
            # output schema declares key string, matching the sibling
            # stream_running_counts contract of string group keys)
            yield pd.DataFrame({"key": [key[0]], "n": [total]})

        def close(self) -> None:
            pass

    return (
        df.groupBy(key_col)
        .transformWithStateInPandas(
            RunningCount(),
            outputStructType="key string, n bigint",
            outputMode="update",
            timeMode="none" if state_ttl_ms is None else "processingTime",
        )
    )

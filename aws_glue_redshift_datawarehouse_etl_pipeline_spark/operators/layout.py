"""Physical-layout operators: multi-dimensional clustering for data
skipping.

A 100 TB table is read through predicates on more than one column, but
a plain sort only localizes the FIRST sort key: row-group min/max
stats (and thus parquet predicate pushdown) become useless for every
other column. Z-ordering interleaves the bits of several quantized
columns into one clustering key, so files and row groups stay tight in
EVERY interleaved dimension — a filter on any of them prunes most of
the table. Same idea Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``;
here it is a layout transform any writer can apply before ``.write``.

Plan shape: one tiny min/max aggregate per column (driver-collected,
C×2 doubles), then a narrow z-value projection (pure bit arithmetic,
codegen'd), then the one range shuffle any clustered write pays
(``repartitionByRange`` + ``sortWithinPartitions`` on the z-value).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_layout"]


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Equal-width quantization of ``col`` into [0, 2^bits): the
    row-group pruning use case only needs MONOTONICITY, not balance —
    heavy skew costs pruning selectivity, never correctness. NULLs map
    to bucket 0 so they cluster together at the curve's origin."""
    n = (1 << bits) - 1
    if lo is None or hi is None or hi <= lo:
        # empty input / all-NULL / constant column: every row bucket 0
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(n)
    return F.coalesce(
        F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(n)),
        F.lit(0),
    )


def zorder_value(
    quantized: Sequence[Column], bits: int = 10
) -> Column:
    """Interleave the low ``bits`` bits of each already-quantized
    column (Morton order): bit b of column c lands at position
    ``b * len(cols) + c``. Static unroll — ``bits × len(cols)``
    shift/mask/or terms, all whole-stage-codegen-able.

    ``bits * len(quantized)`` must fit in the 63 value bits of a long:
    the JVM wraps shift amounts mod 64, so an oversized interleave
    would silently fold high bits onto low ones and scramble the
    clustering key instead of failing."""
    ncols = len(quantized)
    if bits * ncols > 63:
        raise ValueError(
            f"bits * len(cols) = {bits * ncols} exceeds 63: the interleaved "
            "key must fit in a signed long (JVM shifts wrap mod 64, which "
            "would silently corrupt the clustering key). Lower bits "
            f"(max {63 // ncols} for {ncols} columns) or drop columns."
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for c, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + c))
    return z


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` on the Z-curve over ``cols`` (numeric), ready to
    write: each output partition (→ file) and each row group inside it
    covers a small hyper-rectangle of the value space, so min/max
    pruning works for predicates on ANY of ``cols``. The min/max
    bounds are one cheap aggregate (collected: len(cols)×2 doubles);
    everything else is narrow until the single range exchange every
    clustered write pays anyway."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__lo{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"__hi{i}") for i, c in enumerate(cols)],
    ).first()
    qs = [
        _quantize(F.col(c), bounds[f"__lo{i}"], bounds[f"__hi{i}"], bits)
        for i, c in enumerate(cols)
    ]
    with_z = df.withColumn("__z", zorder_value(qs, bits))
    parted = (
        with_z.repartitionByRange(num_partitions, "__z")
        if num_partitions
        else with_z.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")

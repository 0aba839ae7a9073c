"""Event-time windowed aggregation helpers.

The reference's streaming is processing-time micro-batch only
(SURVEY.md §2.10) — these are the documented extensions: watermarked
tumbling/sliding/session windows over the ``events`` stream. Each works
identically on a batch DataFrame (the oracle-checked batch twins live
in queries_analytics.py), so correctness is provable offline and the
same code runs under readStream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_exprs(aggs: Sequence[tuple[str, str, str]]) -> list[Column]:
    out = []
    for fn_name, col, alias in aggs:
        fn = getattr(F, fn_name)
        out.append((fn(F.lit(1)) if col == "*" else fn(col)).alias(alias))
    return out


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[tuple[str, str, str]] = (("count", "*", "n"),),
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: one state entry per (window, keys); with a
    watermark, state is dropped once the watermark passes the window
    end — bounded memory at any stream rate."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(*_agg_exprs(aggs))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *group_cols, *[a[2] for a in aggs])
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[tuple[str, str, str]] = (("count", "*", "n"),),
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"), *group_cols)
        .agg(*_agg_exprs(aggs))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *group_cols, *[a[2] for a in aggs])
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: Sequence[str] = (),
    aggs: Sequence[tuple[str, str, str]] = (("count", "*", "n"),),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (gap-based). The batch twin is the lag+cumsum
    sessionization in queries_analytics.sessionize_events."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *group_cols)
        .agg(*_agg_exprs(aggs))
        .select(F.col("w.start").alias("session_start"), F.col("w.end").alias("session_end"), *group_cols, *[a[2] for a in aggs])
    )

"""Deterministic sampling operators for training-data mixing.

`df.sample()` draws from a per-partition RNG: resampling after a
repartition, a retry, or on another engine yields a different subset.
Data-mixing decisions (per-source rates, ablation splits) need the
OPPOSITE property — membership must be a pure function of the row's
key — so these operators derive it from a portable content hash
(same md5 construction as `operators/dedup._portable_hash`, which any
engine can reproduce). Reference analogue: the sampling entry points
`create_sample_dynamic_frame_from_catalog` / `getSampleFrame`
(`awsglue/context.py:239-281`) expose first-k / probabilistic draws;
the hash-gate here is the scale-correct, reproducible replacement.

Plan shape: a narrow `filter` over the scan — no shuffle, no RNG
state, fully pushdown-compatible — so sampling 100 TB costs one read
and prunes at the row level on every executor independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.dedup import (
    _portable_hash,
)

_DENOM = 1_000_000


def _gate(key_col: str, seed: int) -> Column:
    """Uniform [0, 1e6) integer derived from the row key — the
    deterministic coin every sampler below compares against."""
    return F.pmod(_portable_hash(seed, F.col(key_col).cast("string")), F.lit(_DENOM))


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, seed: int = 0
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, selected by content
    hash of ``key_col``. Re-running, repartitioning, or porting the
    pipeline reproduces the identical subset; disjoint seeds give
    independent draws (ablation splits)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_gate(key_col, seed) < int(round(fraction * _DENOM)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive:
    ``rates`` maps a stratum value (language, source, quality bucket)
    to its keep-fraction; strata not listed keep ``default``. One
    narrow filter, no shuffle; the mix is reproducible row-for-row."""
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
    thresh: Column = F.lit(int(round(default * _DENOM)))
    for k, v in rates.items():
        thresh = F.when(
            F.col(strata_col) == F.lit(k), F.lit(int(round(v * _DENOM)))
        ).otherwise(thresh)
    return df.filter(_gate(key_col, seed) < thresh)

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

from pyspark.sql import Column, DataFrame, Window
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


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    out_col: str = "split",
    seed: int = 0,
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test…)
    by cumulative hash-gate ranges over ``weights`` (must sum to 1).
    Deterministic and leak-proof: a key lands in the same split on
    every run, cluster shape, and engine — the property that keeps a
    validation set honest across pipeline re-runs. Narrow projection,
    no shuffle."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    gate = _gate(key_col, seed)
    names = list(weights)
    # when-chain built innermost-first so the SMALLEST bound is tested
    # first in the final expression (earlier ranges win)
    bounds = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        bounds.append((name, int(round(cum * _DENOM))))
    expr: Column = F.lit(names[-1])
    for name, b in reversed(bounds):
        expr = F.when(gate < b, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def upsample(
    df: DataFrame, weight: float, key_col: str, seed: int = 0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Deterministic fractional upsampling: every row is repeated
    ``floor(weight)`` times, plus one more copy for the hash-gated
    ``frac(weight)`` of keys — so a 2.3× mixture weight reproduces the
    same 2.3× corpus on every run. ``copy_col`` numbers the copies
    (1..n) so downstream shuffles don't collapse them. Narrow explode;
    output size is exactly sum(n_copies), no shuffle introduced."""
    if weight < 0:
        raise ValueError(f"weight must be >= 0, got {weight}")
    whole = int(weight)
    frac_thresh = int(round((weight - whole) * _DENOM))
    n = F.lit(whole) + (_gate(key_col, seed) < frac_thresh).cast("int")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )


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


def order_key(key_col: str, seed: int = 0) -> Column:
    """The deterministic global training-order key: the portable
    content hash of the row key. Sorting by it is a reproducible,
    engine-independent shuffle of the corpus (same md5 construction as
    the sampling gate, so any engine derives the identical order)."""
    return _portable_hash(seed, F.col(key_col).cast("string"))


def deterministic_order(df: DataFrame, key_col: str, seed: int = 0) -> DataFrame:
    """Materialize the corpus in deterministic shuffled order — the
    training-data 'global shuffle' that decorrelates source/ingestion
    order from training position, reproducibly across runs, cluster
    shapes, and engines. Plans as ONE range-partition exchange (a
    parallel sort on the 60-bit key), never a single-partition window;
    write the result with sortWithinPartitions preserved and readers
    stream it in order."""
    return df.orderBy(order_key(key_col, seed), F.col(key_col))


def cap_tokens_per_group(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget: int,
    order_by: list[Column] | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Per-group token-budget capping — the quota step of a data mix
    ('at most N tokens per source/language/domain'): rows are ranked
    inside each group (default: by the deterministic hash of
    ``key_col``, i.e. a reproducible shuffle; pass ``order_by`` to
    keep best-first by quality instead) and kept while the group's
    running token total stays within ``budget``. The row that crosses
    the budget line and everything after it is dropped, so the kept
    total never exceeds ``budget``. One window shuffle keyed on the
    group — map-side combinable nowhere (running sum), but the
    partition key is the group, so skew follows group size, not corpus
    size."""
    if order_by is None:
        if key_col is None:
            raise ValueError("pass order_by or key_col")
        order_by = [order_key(key_col), F.col(key_col)]
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__cum_tokens", F.sum(F.col(token_col)).over(w))
        .filter(F.col("__cum_tokens") <= budget)
        .drop("__cum_tokens")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    num_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Greedy sequence packing: assign each document to a
    fixed-capacity context window ('bin') so training batches waste
    minimal padding — the step between curation and tokenized shards.

    Distribution scheme: documents hash-shard deterministically
    (content hash of the id, so the packing is identical on any
    cluster shape or partitioning), each shard packs independently
    with next-fit over the deterministic shuffle order — an inherently
    sequential fold, so it runs as an Arrow-batched ``applyInPandas``
    per shard (the documented Pandas-UDF escape hatch for semantics a
    window cannot express: bin boundaries depend on the running
    remainder, not a prefix aggregate). Bin ids are globally unique as
    (shard << 32) | local index. Oversized documents (> capacity) get
    a bin of their own and ``oversize=true`` — callers decide whether
    to truncate or drop.

    Scale: one shuffle on the shard key; per-shard state is one
    running remainder. ``num_shards`` bounds parallelism of the
    packing stage itself — set it to ~4x your executor-core count at
    real scale (it changes WHICH bin a doc lands in, never the
    capacity/coverage invariants)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    base = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("__n_tokens"),
        F.pmod(
            _portable_hash(seed + 1, F.col(id_col).cast("string")), F.lit(num_shards)
        ).alias("__shard"),
        _portable_hash(seed, F.col(id_col).cast("string")).alias("__ok"),
    )
    out_schema = (
        f"{id_col} long, bin_id long, bin_offset long, "
        "n_tokens long, oversize boolean"
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["__ok", id_col], kind="mergesort")
        shard = int(pdf["__shard"].iloc[0]) if len(pdf) else 0
        bins, offs, overs = [], [], []
        local_bin, fill = 0, 0
        for n in pdf["__n_tokens"]:
            n = int(n)
            if n > capacity:
                # oversized: own bin, then continue packing fresh
                if fill > 0:
                    local_bin += 1
                bins.append(local_bin)
                offs.append(0)
                overs.append(True)
                local_bin += 1
                fill = 0
                continue
            if fill + n > capacity:
                local_bin += 1
                fill = 0
            bins.append(local_bin)
            offs.append(fill)
            overs.append(False)
            fill += n
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "bin_id": [(shard << 32) | b for b in bins],
                "bin_offset": offs,
                "n_tokens": pdf["__n_tokens"].to_numpy(),
                "oversize": overs,
            }
        )

    return base.groupBy("__shard").applyInPandas(pack, out_schema)


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    budget_docs: int,
    alpha: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based source re-weighting — the multinomial mixing
    rule of multilingual/multi-source pretraining: sampling weight
    ``n_s^alpha`` per source, so ``alpha < 1`` upweights small sources
    relative to their raw share and ``alpha = 1`` is proportional.
    Each source contributes ``floor(budget_docs * w_s / W)`` documents,
    chosen in deterministic portable-hash order (reproducible across
    runs, partitionings, and engines — same md5 gate as the samplers).

    Cross-engine exactness: ``alpha`` 0.5 and 1.0 compute via sqrt /
    identity, which IEEE 754 requires correctly rounded, and the
    weight total ``W`` is a RUNNING sum ordered by source name (a
    window max of the cumulative), so both engines add the same
    doubles in the same order — floor() boundaries can't flip. Other
    alphas go through pow(), which is not correctly-rounded-guaranteed;
    fine for real mixing, not for bit-exact oracle checks.

    One narrow aggregate (counts), a broadcast of the per-source
    targets, and one per-source window for the rank — the fact scan
    shuffles once on the source key; at 100 TB the per-source ordering
    is the only wide operation and it partitions by source."""
    from pyspark.sql import Window

    if alpha == 0.5:
        w_expr = F.sqrt(F.col("n_available").cast("double"))
    elif alpha == 1.0:
        w_expr = F.col("n_available").cast("double")
    else:
        w_expr = F.pow(F.col("n_available").cast("double"), F.lit(alpha))
    counts = (
        df.groupBy(F.col(source_col).alias("__src"))
        .agg(F.count(F.lit(1)).alias("n_available"))
        .withColumn("__w", w_expr)
    )
    run = Window.orderBy("__src").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.orderBy("__src").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # the cumulative is its OWN column before the max, and the total is
    # named __wtot, NOT __W: identifier resolution is case-insensitive
    # in both Spark and ANSI SQL, so __w/__W would silently be ONE
    # column (and a nested max(sum().over()).over() mis-resolves too)
    targets = (
        counts.withColumn("__cum", F.sum("__w").over(run))
        .withColumn("__wtot", F.max("__cum").over(tot))
        .withColumn(
            "target_docs",
            F.floor(
                F.lit(float(budget_docs)) * F.col("__w") / F.col("__wtot")
            ).cast("long"),
        )
    )
    ranked = df.withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy(source_col).orderBy(
                _portable_hash(seed, F.col(key_col).cast("string")), key_col
            )
        ),
    )
    return (
        ranked.join(
            F.broadcast(targets.select("__src", "n_available", "target_docs")),
            ranked[source_col] == F.col("__src"),
        )
        .filter(F.col("__rk") <= F.col("target_docs"))
        .drop("__src", "__rk")
    )

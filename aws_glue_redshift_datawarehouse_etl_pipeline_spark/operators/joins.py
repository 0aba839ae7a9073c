"""Join operators, including the reference's incremental-dedup idiom.

The reference dedups incoming rows against the warehouse with a left
join + IS NULL filter, repeated for six dimensions and one 4-key fact
(/root/reference/pipeline.py:125-127, :975-989). Both that spelling and
the native ``left_anti`` are exposed; they produce identical row sets
and Catalyst plans the anti-join directly (one shuffle on the key, or a
broadcast when the existing side is small).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def equi_join(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str] | None = None,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Generic equi-join on key lists (Join,
    /root/reference/awsglue/transforms/field_transforms.py:384-428;
    fact build /root/reference/pipeline.py:933-938).

    ``broadcast_right`` hints a map-side join for small dimensions —
    on a 1000-executor cluster this removes the shuffle of the big
    side entirely; AQE also auto-converts when the right side is
    under the broadcast threshold.
    """
    if right_keys is None:
        right_keys = list(left_keys)
    if len(left_keys) != len(right_keys):
        raise ValueError("left_keys and right_keys must have equal length")
    r = F.broadcast(right) if broadcast_right else right
    if list(left_keys) == list(right_keys):
        return left.join(r, on=list(left_keys), how=how)
    cond: Column | None = None
    for lk, rk in zip(left_keys, right_keys):
        clause = left[lk] == right[rk]
        cond = clause if cond is None else cond & clause
    return left.join(r, on=cond, how=how)


def left_anti_via_left_join(
    incoming: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    existing_keys: Sequence[str] | None = None,
) -> DataFrame:
    """The reference's dedup spelling: left join + every existing key IS
    NULL + drop helper columns (/root/reference/pipeline.py:975-989 for
    the 4-key composite form). Result set is identical to ``left_anti``;
    Catalyst even rewrites it to the same physical anti-join when the
    filter eliminates the null-extended rows.
    """
    if existing_keys is None:
        existing_keys = list(keys)
    ex = existing.select(*existing_keys).dropDuplicates(list(existing_keys))
    # Alias to avoid ambiguity when key names coincide.
    renamed = {k: f"__existing_{k}" for k in existing_keys}
    ex = ex.withColumnsRenamed(renamed)
    cond: Column | None = None
    for ik, ek in zip(keys, existing_keys):
        clause = incoming[ik] == F.col(f"__existing_{ek}")
        cond = clause if cond is None else cond & clause
    joined = incoming.join(ex, on=cond, how="left")
    null_pred: Column | None = None
    for ek in existing_keys:
        clause = F.col(f"__existing_{ek}").isNull()
        null_pred = clause if null_pred is None else null_pred & clause
    return joined.filter(null_pred).drop(*[f"__existing_{k}" for k in existing_keys])


def incremental_new_rows(
    incoming: DataFrame, existing: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Native spelling of the same dedup: rows of ``incoming`` whose key
    tuple is absent from ``existing``. NULL join keys never match (SQL
    equality), matching the reference's left-join + IS NULL behavior.
    """
    return incoming.join(
        existing.select(*keys).dropDuplicates(list(keys)), on=list(keys), how="left_anti"
    )


def merge_upsert(
    source: DataFrame, stage: DataFrame, primary_keys: Sequence[str]
) -> DataFrame:
    """Upsert merge (mergeDynamicFrame,
    /root/reference/awsglue/dynamicframe.py:436-461): staging rows
    replace source rows with matching PKs; unmatched source rows are
    retained; duplicate records within either side are NOT deduplicated.

    One shuffle on the PK for the anti-join; the union adds none. This
    is the DataFrame-level semantic; for the write side at warehouse
    scale use ``merge_upsert_into_path`` (partition-pruned dynamic
    overwrite — O(batch), not O(table)) or a transactional format's
    ``MERGE INTO`` where deployed.
    """
    keep = source.join(
        stage.select(*primary_keys).dropDuplicates(list(primary_keys)),
        on=list(primary_keys),
        how="left_anti",
    )
    return keep.unionByName(stage)


def _partition_pruning_predicate(
    pcols: Sequence[str],
    parts: Sequence[dict],
    max_partitions: int = 10_000,
) -> Column:
    """Pruning predicate over the collected partition tuples. A stage
    touching thousands of partitions must not become a thousands-deep
    left-nested OR chain (slow Catalyst analysis, potential codegen
    blowup): single-column keys compile to ONE ``IN`` set; composite
    keys get a per-column ``IN`` prefilter (which already prunes the
    file listing) AND a balanced or-tree of exact tuple matches (depth
    log n, not n). The partitions-touched bound is enforced, not
    implied — a merge wider than ``max_partitions`` is an O(table)
    rewrite wearing a merge's clothes and is refused."""
    if len(parts) > max_partitions:
        raise ValueError(
            f"stage touches {len(parts)} partitions (> {max_partitions}): "
            "a merge this wide is effectively a full-table rewrite; "
            "split the stage or raise max_partitions explicitly"
        )

    def col_in(c: str, values: list) -> Column:
        # isin never matches NULL, so a null partition value (Hive's
        # __HIVE_DEFAULT_PARTITION__) needs an explicit isNull arm
        non_null = [v for v in values if v is not None]
        pred = F.col(c).isin(non_null) if non_null else F.lit(False)
        if len(non_null) != len(values):
            pred = pred | F.col(c).isNull()
        return pred

    if len(pcols) == 1:
        return col_in(pcols[0], [p[pcols[0]] for p in parts])

    prefilter = None
    for c in pcols:
        ci = col_in(c, list({p[c] for p in parts}))
        prefilter = ci if prefilter is None else prefilter & ci

    def clause(p: dict) -> Column:
        cl = None
        for c in pcols:
            eq = F.col(c).eqNullSafe(F.lit(p[c]))
            cl = eq if cl is None else cl & eq
        return cl

    def or_tree(cs: list) -> Column:
        if len(cs) == 1:
            return cs[0]
        mid = len(cs) // 2
        return or_tree(cs[:mid]) | or_tree(cs[mid:])

    return prefilter & or_tree([clause(p) for p in parts])


def merge_upsert_into_path(
    spark,
    table_path: str,
    stage: DataFrame,
    primary_keys: Sequence[str],
    partition_cols: Sequence[str],
    fmt: str = "parquet",
) -> list[dict]:
    """Warehouse-scale MERGE seam: apply ``merge_upsert`` semantics to a
    partitioned table on disk, rewriting ONLY the partitions the staged
    batch touches (dynamic partition overwrite) instead of the whole
    table — the difference between an O(batch) and an O(table) write at
    100 TB. Where a transactional format (Delta/Iceberg ``MERGE INTO``)
    is available it supersedes this; on plain parquet this is the
    standard partition-pruned merge.

    CONTRACT: every ``partition_cols`` value must be a pure function of
    the primary key (a date that is part of the key, a key-derived hash
    bucket, ...). If a key could change partitions between the table
    and the stage, its old row would live in a partition this merge
    never reads or rewrites, leaving a duplicate. The affected-
    partition list is computed from the stage alone under this
    contract.

    Plan shape: one distinct over the stage's partition columns (tiny —
    bounded by partitions-touched, collected to build the pruning
    predicate), a partition-PRUNED read of the table (only affected
    partitions are scanned; verify `PartitionFilters` in the plan), the
    merge's single PK shuffle, and a staged write replacing exactly the
    affected partition directories.

    The write follows the commit-marker protocol
    (``sources/maintenance.py``): merged partitions are fully staged to
    a sibling directory, an intent marker lists each directory to swap
    (and whether it pre-existed), displaced originals survive under the
    stage until the marker clears. A crash at ANY point leaves the
    table recoverable at its pre-merge snapshot via ``recover_path`` —
    readers through ``WarehouseCatalog.read_table`` heal automatically,
    and the upsert simply re-runs. Returns the list of affected
    partition-value dicts for observability."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources import (
        maintenance as MT,
    )

    MT.ensure_recovered(spark, table_path)
    pcols = list(partition_cols)
    parts = [r.asDict() for r in stage.select(*pcols).distinct().collect()]
    if not parts:
        return []
    affected = spark.read.format(fmt).load(table_path).filter(
        _partition_pruning_predicate(pcols, parts)
    )
    merged = merge_upsert(affected, stage, primary_keys)

    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(table_path).getFileSystem(spark._jsc.hadoopConfiguration())
    stage_dir = table_path.rstrip("/") + "__merge_stage"
    if fs.exists(P(stage_dir)):
        # stale stage from a crash BEFORE its marker was written: the
        # table was never touched, the stage is garbage
        fs.delete(P(stage_dir), True)
    merged.write.format(fmt).mode("overwrite").partitionBy(*pcols).save(stage_dir)
    rels = MT.list_partition_dirs(spark, stage_dir, len(pcols))
    parts_meta = [
        {"rel": r, "had_old": bool(fs.exists(P(f"{table_path}/{r}")))} for r in rels
    ]
    MT.write_commit_marker(
        spark, table_path, {"op": "merge", "stage": stage_dir, "parts": parts_meta}
    )
    MT.staged_partition_swap(spark, table_path, stage_dir, parts_meta)
    MT.clear_commit_marker(spark, table_path)
    fs.delete(P(stage_dir), True)
    return parts


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """CDC-style diff of two table snapshots: one row per key present
    in either side, labeled ``added`` (new only), ``removed`` (old
    only), ``changed`` (both, compared columns differ), or
    ``unchanged`` (emitted only with ``include_unchanged``). The
    companion to the incremental-load surface: what `mergeDynamicFrame`
    applies, this audits.

    Scale shape: each side is first PROJECTED to (keys, md5 row
    fingerprint of the compared columns) — the full-outer join, the
    only shuffle, carries fingerprint-width rows regardless of table
    width. Null-safe: every compared value goes through a sentinel (\\u0001)
    + unit-separator (\\u001f) concat, so NULL vs '' vs absent all fingerprint
    differently."""
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in set(keys)
        ]

    def fp(cols: Sequence[str]) -> Column:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\u0001")) for c in cols
        ]
        return F.md5(F.concat_ws("\u001f", *parts))

    o = old.select(*keys, fp(compare_cols).alias("__fp_old"))
    n = new.select(*keys, fp(compare_cols).alias("__fp_new"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), "added")
        .when(F.col("__fp_new").isNull(), "removed")
        .when(F.col("__fp_old") != F.col("__fp_new"), "changed")
        .otherwise("unchanged")
    )
    out = j.select(change.alias("change_type"), *keys)
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def salted_equi_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread a hot join key across
    ``salt_buckets`` reducers by salting the skewed side with a
    deterministic hash of its full row, and replicating the other
    (smaller) side once per salt value. Result set is identical to the
    plain equi-join; the shuffle key becomes (key, salt) so no single
    reducer receives an entire hot key's rows. AQE's skew-join split
    handles moderate skew automatically — salting is the explicit tool
    for pathological keys (the 100 TB case where one key holds >1
    partition's worth of rows).
    """
    if how.replace("_outer", "") in ("right", "full"):
        # unmatched rows of the replicated side would appear once per
        # salt value — flip the sides or pre-aggregate instead
        raise ValueError(f"salted join does not support how={how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)
    ).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return left.join(right, on=[*on, "__salt"], how=how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    tiebreak: str | None = None,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the single nearest right
    row with ``right_ts <= left_ts`` (backward; ``forward`` flips the
    inequality) within the same key group.

    Not in the reference's surface (SURVEY §2.5 notes its absence) —
    this is the time-series extension a warehouse of `events` needs.

    Spark-first plan: NO join operator at all. Both sides are unioned
    with a side tag, and one window pass over (keys) ordered by
    (ts, side, tiebreak) carries the latest right-side payload onto
    each left row — a single hash shuffle on the keys, linear work per
    partition, no range/nested-loop join at any scale. This is the
    same plan a 100 TB run wants: the shuffle key is the join key, and
    skew is bounded by per-key event density, not pair counts.

    ``left_ts``/``right_ts`` must be numeric (e.g. epoch micros) so
    tolerance arithmetic and the forward flip stay exact. Ties on the
    right (equal ts) resolve to the greatest ``tiebreak`` value;
    a right row tied with a left row's ts counts as a match.
    ``tolerance``: max allowed ``left_ts - right_ts`` (same unit as
    the ts columns); matches beyond it become NULLs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = list(on)
    rvals = list(right_value_cols)
    clash = set(rvals) & set(left.columns)
    if clash:
        raise ValueError(f"right_value_cols collide with left columns: {sorted(clash)}")
    sign = 1 if direction == "backward" else -1
    tb = F.col(tiebreak) if tiebreak is not None else F.lit(0)

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        (F.col(left_ts) * sign).alias("__ats"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None)
        .cast(
            T.StructType(
                [T.StructField("__rts", T.LongType())]
                + [T.StructField(c, right.schema[c].dataType) for c in rvals]
            )
        )
        .alias("__payload"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in keys else F.col(c) for c in left.columns],
        (F.col(right_ts) * sign).alias("__ats"),
        F.lit(0).alias("__side"),
        tb.cast("long").alias("__tb"),
        F.struct(
            F.col(right_ts).cast("long").alias("__rts"),
            *[F.col(c) for c in rvals],
        ).alias("__payload"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ats").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l_tag.unionByName(r_tag).withColumn(
        "__m", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = F.col(left_ts) - F.col("__m.__rts") if sign == 1 else F.col("__m.__rts") - F.col(left_ts)
        matched = matched.withColumn(
            "__m", F.when(gap <= F.lit(tolerance), F.col("__m"))
        )
    return matched.select(
        *[F.col(c) for c in left.columns],
        F.col("__m.__rts").alias("matched_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in rvals],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    bin_width: int | None = None,
) -> DataFrame:
    """Interval join: all (left, right) pairs with equal keys and
    ``right_ts`` in ``[left_ts + lower, left_ts + upper]`` (numeric ts,
    e.g. epoch micros; lower <= upper, both may be negative).

    A raw inequality join plans as a nested-loop join — quadratic per
    key group and a non-starter at scale. Instead the left side
    explodes to the time bins its window spans (bin width defaults to
    the window span, so that's at most 2 bins per row), the right side
    maps to its own bin, and the equality (keys, bin) drives one hash
    shuffle; the exact range predicate filters candidates after. Each
    qualifying pair appears exactly once (a right row lives in one
    bin). Flink's interval join and KDB's window join use the same
    binned-equi-join shape.
    """
    if lower > upper:
        raise ValueError("lower must be <= upper")
    span = upper - lower
    width = bin_width or max(span, 1)
    keys = list(on)
    clash = set(left.columns) & set(right.columns) - set(keys)
    if clash:
        raise ValueError(f"ambiguous columns on both sides: {sorted(clash)}")
    lo_bin = F.floor((F.col(left_ts) + lower) / width).cast("long")
    hi_bin = F.floor((F.col(left_ts) + upper) / width).cast("long")
    l_binned = left.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    r_binned = right.withColumn(
        "__bin", F.floor(F.col(right_ts) / width).cast("long")
    )
    return (
        l_binned.join(r_binned, on=keys + ["__bin"])
        .filter(
            F.col(right_ts).between(F.col(left_ts) + lower, F.col(left_ts) + upper)
        )
        .drop("__bin")
    )

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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

    One shuffle on the PK for the anti-join; the union adds none. At
    warehouse scale the same semantics map to Delta ``MERGE INTO``
    (whenMatched update / whenNotMatched insert).
    """
    keep = source.join(
        stage.select(*primary_keys).dropDuplicates(list(primary_keys)),
        on=list(primary_keys),
        how="left_anti",
    )
    return keep.unionByName(stage)


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

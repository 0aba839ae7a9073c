"""Data-quality expectations: declarative row-level rules with
keep / quarantine / fail actions and per-rule violation metrics — the
pipeline-gate pattern the reference expresses imperatively through its
error channel and threshold asserts (DynamicFrame error records +
``stageThreshold``/``totalThreshold``, /root/reference/awsglue/
dynamicframe.py:80-124), generalized to named predicates the way the
public expectations APIs (constraint checks on pipelines) spell it.

Design for scale: every rule is a Column predicate evaluated in ONE
narrow pass (whole-stage codegen, no shuffle); the per-rule metrics
ride Spark's observe API on the same pass, so counting violations adds
zero jobs. The split into (valid, quarantined) is two filters over one
cached evaluation — Catalyst collapses the rule columns into each.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_expectations", "ExpectationsFailed"]

_FLAG = "__expect_ok"
_FAILED = "__expect_failed"


class ExpectationsFailed(RuntimeError):
    """Raised by ``on_violation='fail'`` when any rule is violated."""


def check_expectations(
    df: DataFrame,
    rules: Mapping[str, Column],
    on_violation: str = "quarantine",
    observation_name: str | None = None,
) -> tuple[DataFrame, DataFrame | None, object | None]:
    """Evaluate named row-level ``rules`` (predicate Columns that are
    True for GOOD rows; NULL counts as a violation — an unknown value
    cannot satisfy a constraint) against ``df``.

    Returns ``(valid, quarantined, observation)``:

    - ``on_violation='drop'``: valid rows only; ``quarantined`` is None.
    - ``'quarantine'`` (default): bad rows are returned separately with
      a ``failed_expectations`` array column naming every rule each row
      broke — the error-channel upgrade: not just "this row failed" but
      WHY, in-band.
    - ``'fail'``: an action is run and ``ExpectationsFailed`` is raised
      if any rule is violated (the reference's threshold-assert shape
      with threshold 0); on success returns (df, None, observation).

    ``observation`` is a ``pyspark.sql.Observation`` whose ``get``
    (after the caller's first action on ``valid``, or immediately for
    ``'fail'``) yields ``{rows_total, rows_failed, failed_<rule>...}``
    computed on the same pass as the data — no extra job."""
    from pyspark.sql import Observation

    if on_violation not in ("drop", "quarantine", "fail"):
        raise ValueError(f"unknown on_violation: {on_violation!r}")

    oks = {name: F.coalesce(rule, F.lit(False)) for name, rule in rules.items()}
    all_ok = F.lit(True)
    for ok in oks.values():
        all_ok = all_ok & ok
    failed_names = F.filter(
        F.array(
            *[F.when(~ok, F.lit(name)) for name, ok in oks.items()]
        ),
        lambda x: x.isNotNull(),
    )

    obs = Observation(observation_name or "expectations")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_total"),
        F.sum(F.when(~all_ok, 1).otherwise(0)).alias("rows_failed"),
        *[
            F.sum(F.when(~ok, 1).otherwise(0)).alias(f"failed_{name}")
            for name, ok in oks.items()
        ],
    )

    if on_violation == "fail":
        n_bad = observed.filter(~all_ok).count()
        if n_bad:
            raise ExpectationsFailed(
                f"{n_bad} row(s) violated expectations {sorted(rules)}"
            )
        return df, None, obs

    flagged = observed.withColumn(_FLAG, all_ok)
    valid = flagged.filter(F.col(_FLAG)).drop(_FLAG)
    if on_violation == "drop":
        return valid, None, obs
    quarantined = (
        flagged.filter(~F.col(_FLAG))
        .drop(_FLAG)
        .withColumn("failed_expectations", failed_names)
    )
    return valid, quarantined, obs

"""Property fuzz for persisted-CHECK-constraint ENFORCEMENT (VERDICT
r7 ask #7). The soundness contract of ``_violation_counts`` is SQL
CHECK semantics: a row violates a constraint iff the expression
evaluates to FALSE — NULL passes. Any divergence between what the
engine counts and what the expression text means in ANSI SQL would
either reject clean commits (annoying) or persist violating rows
under a constraint that any other writer then trusts (unsound — the
manifest's persisted constraints are enforced by every writer,
``sources/txlog.py`` commit path).

Like the DML-pruning fuzz, the oracle is the rendered TEXT evaluated
by DuckDB (``count(*) WHERE NOT (expr)`` — NULL falls out of WHERE
exactly as CHECK lets it pass), never a Python re-implementation, so
renderer and oracle cannot diverge on SQL precedence/NULL rules. One
seeded generator + ONE Spark aggregate evaluates the whole batch of
expressions (each fuzz case is an aliased aggregate column), so 120
cases cost one job, not 120 sessions.

The grid includes NULLs in every column to force the three-valued
cases: a numeric comparison against NULL is NULL (pass), NOT(NULL) is
NULL (pass), NULL AND FALSE is FALSE (violate).
"""
from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
    _refuse_if_constrained,
    _violation_counts,
)

NUM_COLS = ("id", "val")
STR_VALS = ("alpha", "beta", "gamma")

_GRID = [
    {"id": i, "val": v, "tag": tg}
    for i in (None, -21, -10, -2, 0, 1, 3, 10, 21)
    for v in (None, -2.5, 0.0, 0.5, 3.25, 10.0)
    for tg in (None,) + STR_VALS
]


def _gen(rng: random.Random, depth: int) -> str:
    """Random constraint expression text, valid in Spark SQL and
    DuckDB alike; randomized parenthesization and spacing."""
    if depth == 0 or rng.random() < 0.35:
        kind = rng.randrange(4)
        if kind == 0:
            col = rng.choice(NUM_COLS)
            cmp = rng.choice((">=", "<=", "=", ">", "<", "<>"))
            lit = rng.randint(-20, 20) if col == "id" else rng.choice(
                (-2.5, 0.0, 0.5, 3.25, 10.0)
            )
            return f"{col} {cmp} {lit}"
        if kind == 1:
            col = rng.choice(NUM_COLS)
            lo = rng.randint(-20, 10)
            return f"{col} BETWEEN {lo} AND {lo + rng.randint(0, 15)}"
        if kind == 2:
            vals = rng.sample(STR_VALS, rng.randint(1, 3))
            quoted = ", ".join(f"'{v}'" for v in vals)
            return f"tag IN ({quoted})"
        col = rng.choice(NUM_COLS + ("tag",))
        return f"{col} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
    a = _gen(rng, depth - 1)
    b = _gen(rng, depth - 1)
    r = rng.random()
    if r < 0.4:
        return f"({a}) AND ({b})" if rng.random() < 0.7 else f"{a} AND {b}"
    if r < 0.8:
        return f"({a}) OR ({b})" if rng.random() < 0.7 else f"({a}) OR {b}"
    return f"NOT ({a})"


@pytest.fixture(scope="module")
def grid_df(spark):
    return spark.createDataFrame(
        _GRID, "id long, val double, tag string"
    ).coalesce(2)


def test_violation_counts_match_sql_check_semantics(grid_df):
    rng = random.Random(8_42)
    cons = {f"c{i}": _gen(rng, 3) for i in range(120)}

    got = _violation_counts(grid_df, cons)

    con = duckdb.connect()
    con.register("grid", pd.DataFrame(_GRID))
    for name, expr in cons.items():
        want = con.execute(
            f"SELECT count(*) FROM grid WHERE NOT ({expr})"
        ).fetchone()[0]
        assert got.get(name, 0) == want, (name, expr)
    # the fuzz batch must exercise both outcomes, or the run is vacuous
    assert got and len(got) < len(cons)


def test_null_rows_pass_check_semantics(grid_df):
    """The defining CHECK subtlety, pinned explicitly: NULL id rows do
    NOT violate `id >= 0`, but DO violate `id IS NOT NULL`."""
    n_null = sum(1 for r in _GRID if r["id"] is None)
    assert n_null > 0
    got = _violation_counts(
        grid_df, {"pos": "id >= 0", "req": "id IS NOT NULL"}
    )
    neg = sum(1 for r in _GRID if r["id"] is not None and r["id"] < 0)
    assert got.get("pos", 0) == neg
    assert got.get("req", 0) == n_null


def test_refuse_if_constrained_word_boundary():
    """Rename/drop refusal scans constraint text conservatively: a
    whole-word reference (any case) blocks; a superstring identifier
    does not false-positive."""
    head = {"constraints": {"ck": "VAL >= 0 AND id_ext <> 3"}}
    with pytest.raises(ValueError, match="referenced by CHECK"):
        _refuse_if_constrained(head, "val", "drop")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        _refuse_if_constrained(head, "id_ext", "rename")
    _refuse_if_constrained(head, "id", "drop")  # substring of id_ext only

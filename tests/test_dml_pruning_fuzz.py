"""Property-based soundness fuzz of ``_derive_dml_pruning``.

The derivation's contract is IMPLICATION: any row satisfying the DML
condition must also satisfy every derived range bound and equality
probe — otherwise min/max or Bloom pruning could skip a file holding
matching rows and the DELETE/UPDATE would silently miss them.

The fuzzer generates a random predicate AST over three typed columns,
renders it to SQL text with adversarially random spacing and
parenthesization (the class of input that broke the old substring-scan
— ``(a=1)OR(b=2)`` carries no spaced ``" OR "``), evaluates the AST
directly in Python (we built it, so its semantics are exact and no
Spark round-trip is needed), and asserts the implication on a grid of
rows. Coverage is free to be zero — deriving nothing is always sound —
but anything derived must be implied.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
    _derive_dml_pruning,
)

# -- predicate AST ----------------------------------------------------------

NUM_COLS = ("id", "val")
STR_COL = "tag"
STR_VALS = ("a", "b", "it's", "x y")

_num_lit = st.one_of(
    st.integers(min_value=-20, max_value=20),
    st.sampled_from((-2.5, 0.5, 3.25, 10.0)),
)

_cmp = st.sampled_from((">=", "<=", "=", ">", "<"))


def _leaves():
    num = st.tuples(st.just("numcmp"), st.sampled_from(NUM_COLS), _cmp, _num_lit)
    text = st.tuples(
        st.just("strcmp"), st.just(STR_COL), _cmp, st.sampled_from(STR_VALS)
    )
    within = st.tuples(
        st.just("between"),
        st.sampled_from(NUM_COLS),
        _num_lit,
        _num_lit,
    )
    member = st.tuples(
        st.just("in"),
        st.sampled_from(NUM_COLS),
        st.lists(_num_lit, min_size=1, max_size=3),
    )
    return st.one_of(num, text, within, member)


def _trees(depth: int = 3):
    if depth == 0:
        return _leaves()
    sub = _trees(depth - 1)
    return st.one_of(
        _leaves(),
        st.tuples(st.just("and"), sub, sub),
        st.tuples(st.just("or"), sub, sub),
        st.tuples(st.just("not"), sub),
    )


def _eval(node, row: dict) -> bool:
    op = node[0]
    if op == "numcmp" or op == "strcmp":
        _, col, cmp, lit = node
        v = row[col]
        return {
            ">=": v >= lit,
            "<=": v <= lit,
            "=": v == lit,
            ">": v > lit,
            "<": v < lit,
        }[cmp]
    if op == "between":
        _, col, lo, hi = node
        return lo <= row[col] <= hi
    if op == "in":
        _, col, vals = node
        return row[col] in vals
    if op == "and":
        return _eval(node[1], row) and _eval(node[2], row)
    if op == "or":
        return _eval(node[1], row) or _eval(node[2], row)
    if op == "not":
        return not _eval(node[1], row)
    raise AssertionError(op)


def _render(node, rng) -> str:
    """SQL text with randomized spacing/parens — the adversarial part."""

    def sp() -> str:
        return " " * rng.randint(0, 2)

    def wrap(s: str) -> str:
        return f"({sp()}{s}{sp()})" if rng.random() < 0.6 else s

    op = node[0]
    if op == "numcmp":
        _, col, cmp, lit = node
        return wrap(f"{col}{sp()}{cmp}{sp()}{lit}")
    if op == "strcmp":
        _, col, cmp, lit = node
        q = lit.replace("'", "''")
        return wrap(f"{col}{sp()}{cmp}{sp()}'{q}'")
    if op == "between":
        _, col, lo, hi = node
        return wrap(f"{col} BETWEEN {lo} AND {hi}")
    if op == "in":
        _, col, vals = node
        return wrap(f"{col} IN ({','.join(str(v) for v in vals)})")
    if op == "and":
        return wrap(f"{_render(node[1], rng)}{sp()}AND{sp()}{_render(node[2], rng)}")
    if op == "or":
        # adversarial: sometimes NO spaces around OR at all
        s = "" if rng.random() < 0.5 else " "
        return wrap(f"{_render(node[1], rng)}{s}OR{s}{_render(node[2], rng)}")
    if op == "not":
        return wrap(f"NOT {_render(node[1], rng)}")
    raise AssertionError(op)


# the row grid the implication is checked against: every generated
# literal bound sits inside [-20, 20], so ±21 covers strict/inclusive
# edges on both sides
_GRID = [
    {"id": i, "val": v, "tag": tg}
    for i in (-21, -10, -2, 0, 1, 3, 10, 21)
    for v in (-2.5, 0.0, 0.5, 3.25, 10.0)
    for tg in STR_VALS
]


@settings(max_examples=300, deadline=None)
@given(tree=_trees(), seed=st.integers(min_value=0, max_value=2**31))
def test_derived_pruning_is_implied_by_the_predicate(tree, seed):
    import random

    text = _render(tree, random.Random(seed))
    rf, eq = _derive_dml_pruning(text)
    for col in rf:
        assert col in NUM_COLS, (col, text)
    for row in _GRID:
        if not _eval(tree, row):
            continue
        # the row matches the predicate: it must survive BOTH prune modes
        for col, (lo, hi) in rf.items():
            assert lo <= row[col] <= hi, (text, row, rf)
        for col, v in eq.items():
            assert row[col] == v, (text, row, eq)

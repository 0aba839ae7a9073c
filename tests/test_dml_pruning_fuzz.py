"""Property-based soundness fuzz of ``_derive_dml_pruning``.

The derivation's contract is IMPLICATION: any row satisfying the DML
condition must also satisfy every derived range bound and equality
probe — otherwise min/max or Bloom pruning could skip a file holding
matching rows and the DELETE/UPDATE would silently miss them.

The fuzzer generates a random predicate AST over three typed columns
and renders it to SQL text with adversarially random spacing,
parenthesization, and injected comments (the input classes that broke
earlier revisions: ``(a=1)OR(b=2)`` carries no spaced ``" OR "``; a
``--`` comment can hide a conjunct from a naive lexer). The oracle is
the rendered TEXT itself, evaluated by DuckDB over a row grid — not a
Python re-evaluation of the AST — so the renderer and the oracle can
never diverge on SQL precedence again (the round-7 failure was exactly
that: the renderer dropped NOT's parens, changing the text's meaning
while the AST oracle kept the original). Coverage is free to be zero —
deriving nothing is always sound — but anything derived must be
implied by what the TEXT means.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import assume, given, settings
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


def _render(node, rng) -> str:
    """SQL text with randomized spacing/parens/comments — the
    adversarial part. NOT's operand is ALWAYS parenthesized so the
    rendered text means the AST regardless of precedence; everything
    else is free to drop parens or glue tokens together. Injected
    comments are dialect-independent (line comments newline-terminated,
    block comments non-nested) so the DuckDB oracle and Spark agree on
    what they mean; the Spark-specific nesting semantics get their own
    pinned tests below."""

    def sp() -> str:
        r = rng.random()
        if r < 0.08:
            return f" /* c{rng.randint(0, 99)} */ "
        if r < 0.12:
            return f" -- c{rng.randint(0, 99)}\n "
        return " " * rng.randint(0, 2)

    def sp1() -> str:
        # at least one separator: beside a bare keyword, zero spacing
        # would glue into one identifier (`ANDid`) — not SQL
        s = sp()
        return s if s else " "

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
        if rng.random() < 0.3:
            # adversarial: glued keyword, legal only with forced parens
            return wrap(f"({_render(node[1], rng)})AND({_render(node[2], rng)})")
        return wrap(f"{_render(node[1], rng)}{sp1()}AND{sp1()}{_render(node[2], rng)}")
    if op == "or":
        if rng.random() < 0.5:
            # adversarial: no spaced " OR " anywhere in the text
            return wrap(f"({_render(node[1], rng)})OR({_render(node[2], rng)})")
        return wrap(f"{_render(node[1], rng)}{sp1()}OR{sp1()}{_render(node[2], rng)}")
    if op == "not":
        return wrap(f"NOT ({_render(node[1], rng)})")
    raise AssertionError(op)


# the row grid the implication is checked against: every generated
# literal bound sits inside [-20, 20], so ±21 covers strict/inclusive
# edges on both sides
_GRID = [
    {"idx": n, "id": i, "val": v, "tag": tg}
    for n, (i, v, tg) in enumerate(
        (i, v, tg)
        for i in (-21, -10, -2, 0, 1, 3, 10, 21)
        for v in (-2.5, 0.0, 0.5, 3.25, 10.0)
        for tg in STR_VALS
    )
]

def _fresh_con():
    con = duckdb.connect()
    con.register("grid", pd.DataFrame(_GRID))
    return con


_CON = _fresh_con()


class OracleCannotEvaluate(Exception):
    """DuckDB hit an INTERNAL assertion on this rendered text (a real
    upstream parser bug — e.g. `x BETWEEN a AND b AND (...)` with a
    trailing block comment dereferences a NULL unique_ptr in the 1.x
    optimizer). The example is skipped via hypothesis.assume — but
    only AFTER the engine's derivation has already run on the text, so
    lexer crashes on such inputs would still fail the test."""


def _text_matches(text: str) -> list[bool]:
    """The rendered text's OWN meaning, row by row: DuckDB evaluates it
    against the grid, so precedence/comment semantics come from a real
    SQL parser, not a Python re-implementation."""
    global _CON
    try:
        rows = _CON.execute(
            f"SELECT COALESCE(({text}), FALSE) FROM grid ORDER BY idx"
        ).fetchall()
    except duckdb.InternalException as ex:  # poisoned connection: rebuild
        _CON = _fresh_con()
        raise OracleCannotEvaluate(text) from ex
    return [bool(r[0]) for r in rows]


@settings(max_examples=300, deadline=None)
@given(tree=_trees(), seed=st.integers(min_value=0, max_value=2**31))
def test_derived_pruning_is_implied_by_the_predicate(tree, seed):
    import random

    text = _render(tree, random.Random(seed))
    # derivation FIRST: even for texts the oracle cannot score, the
    # lexer must not crash and may only emit numeric-column bounds
    rf, eq = _derive_dml_pruning(text)
    for col in rf:
        assert col in NUM_COLS, (col, text)
    try:
        matches = _text_matches(text)
    except OracleCannotEvaluate:
        assume(False)  # upstream DuckDB assertion bug — example unscorable
    for row, matched in zip(_GRID, matches):
        if not matched:
            continue
        # the row matches the predicate: it must survive BOTH prune modes
        for col, (lo, hi) in rf.items():
            assert lo <= row[col] <= hi, (text, row, rf)
        for col, v in eq.items():
            assert row[col] == v, (text, row, eq)


# -- pinned regressions -----------------------------------------------------


def test_pinned_grouped_not_over_conjunction_derives_nothing():
    """The round-7 falsifying SHAPE, rendered unambiguously: a NOT over
    a parenthesized conjunction poisons the whole (single) conjunct."""
    assert _derive_dml_pruning("NOT ((id >= 0) AND (id >= 0))") == ({}, {})


def test_pinned_depth0_not_beside_live_conjunct():
    """`NOT (...) AND id >= 5`: the NOT conjunct derives nothing, the
    live conjunct still contributes."""
    rf, eq = _derive_dml_pruning("NOT (val <= 3) AND id >= 5")
    assert rf == {"id": (5, float("inf"))} and eq == {}


def test_line_comment_does_not_contribute_bounds():
    """The ADVICE exploit: commented-out text must not derive a bound —
    Spark strips the comment, so the real predicate is just id = 1 and
    a derived bound on val would prune files holding matching rows."""
    rf, eq = _derive_dml_pruning("id = 1 -- old: AND val = 2")
    assert rf == {"id": (1, 1)} and eq == {"id": 1}


def test_nested_block_comment_is_one_comment():
    """Spark's bracketed comments nest: `/* /* */ ... */` is ONE
    comment, so only the text after the OUTER close is live. A
    first-`*/`-wins stripper would resurrect `id = 1 AND` here and
    derive an unsound bound on id."""
    rf, eq = _derive_dml_pruning("/* /* */ id = 1 AND */ val = 2")
    assert rf == {"val": (2, 2)} and eq == {"val": 2}


def test_unterminated_block_comment_disables_derivation():
    assert _derive_dml_pruning("id = 1 /* oops") == ({}, {})


def test_comment_markers_inside_string_literals_are_content():
    rf, eq = _derive_dml_pruning("tag = '--/*x*/'")
    assert rf == {} and eq == {"tag": "--/*x*/"}


def test_comment_markers_inside_double_quoted_literals_are_content():
    """ADVICE r8 (high): Spark parses ``"x--y"`` as a string literal by
    default, so the ``--`` inside it is content. A stripper that treats
    only single quotes as strings strips the rest of the line — losing
    the depth-0 OR — and derives ``id = 1``'s bound for a predicate
    that also matches ``id = 2`` rows: unsound pruning."""
    assert _derive_dml_pruning('id = 1 AND tag = "x--y" OR id = 2') == ({}, {})
    # comment markers + doubled-quote escape, no live OR: the sibling
    # conjunct still derives, the double-quoted conjunct derives nothing
    # (under ANSI mode "…" is an identifier, so an eq probe on its text
    # would be unsound)
    rf, eq = _derive_dml_pruning('id = 1 AND tag = "a""--/*b"')
    assert rf == {"id": (1, 1)} and eq == {"id": 1}


def test_double_quoted_literal_lexes_as_one_token():
    """Without a double-quote token class, ``tag = "AND val = 5 AND"``
    (a string equality in Spark's default mode) splinters into a
    spurious ``val = 5`` conjunct — a derived bound on a column the
    real predicate never constrains."""
    assert _derive_dml_pruning('tag = "AND val = 5 AND"') == ({}, {})
    rf, eq = _derive_dml_pruning('tag = "AND val = 5 AND" AND id >= 3')
    assert rf == {"id": (3, float("inf"))} and eq == {}
    # parens inside the literal must not corrupt depth tracking either
    rf, eq = _derive_dml_pruning('tag = ")(" AND id = 7')
    assert rf == {"id": (7, 7)} and eq == {"id": 7}


def test_backslash_in_literal_disables_derivation():
    """Backslash escapes are config-dependent (honored by default,
    literal under ``spark.sql.parser.escapedStringLiterals``): the same
    text denotes different values — ``'C:\\path'`` is ``C:path`` vs
    ``C:\\path`` — or different structure (``'a\\'`` may or may not end
    the literal). An eq probe for either reading is wrong in the other
    mode, so any backslash disables derivation entirely."""
    assert _derive_dml_pruning(r"tag = 'C:\path'") == ({}, {})
    assert _derive_dml_pruning(r"tag = 'a\' OR id = 2 -- '") == ({}, {})
    assert _derive_dml_pruning(r'tag = "a\" OR id = 2 /* "') == ({}, {})


def test_block_comment_as_token_separator():
    """A comment can BE the whitespace between tokens."""
    rf, eq = _derive_dml_pruning("id/* gap */=/* gap */7 AND val >= 0")
    assert eq == {"id": 7}
    assert rf == {"id": (7, 7), "val": (0, float("inf"))}


def test_case_canon_collision_is_exact_match_only():
    """ADVICE r7: a schema with columns differing only in case (legal —
    the manifest schema merge is by exact name) must not let a bound
    derived from one spelling land on the other column's stats/Blooms.
    Unique-lowercase names keep Spark's case-insensitive resolution."""
    from collections import namedtuple

    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
        _case_canon,
    )

    Fld = namedtuple("Fld", "name")
    canon = _case_canon([Fld("id"), Fld("Val"), Fld("VAL")])
    assert canon("ID") == "id"  # unique lowercase: any case resolves
    assert canon("Val") == "Val"  # colliding: exact spelling only
    assert canon("VAL") == "VAL"
    assert canon("val") is None  # colliding + case mismatch: derive nothing
    assert canon("nope") is None


def test_pinned_duckdb_internal_error_text_is_derived_soundly():
    """The text that crashes DuckDB 1.x's optimizer (NULL unique_ptr on
    `BETWEEN ... AND ... AND (...)` with a trailing block comment) must
    still lex cleanly on the engine side — and since its outer parens
    strip to a depth-0 OR, derivation must refuse entirely."""
    text = (
        "( (  id BETWEEN 0 AND 0 ) AND (id BETWEEN 2 AND 0 )  OR "
        "id BETWEEN 0 AND 0  AND  (  id BETWEEN 2 AND 0) /* c70 */ )"
    )
    assert _derive_dml_pruning(text) == ({}, {})

#!/usr/bin/env python
"""Scale-decade data generator: replicate /root/testdata/sf0.1 N-fold
into a new directory with disjoint keys, preserving per-query workload
shape so bench.py wall-times measure SCALING, not a different problem.

The driver-provided testdata stops at sf0.1 (~600k lineitem); the
100-TB design claims deserve at least one measured decade (VERDICT r7
ask #4). This script builds sfN = N x sf0.1 deterministically
(seed=42), without touching /root/testdata:

- region/nation: fixed dimensions, copied as-is.
- customer/supplier/part/orders/lineitem/events: N copies with key
  columns offset by copy * 10^7 (all referencing columns shifted by
  the same stride, so referential integrity and per-key fan-outs are
  EXACTLY preserved; date/price/flag distributions are untouched, so
  every filter keeps its selectivity).
- documents: N copies with fresh doc_ids and per-copy word-shuffled
  text (deterministic RNG per (doc, copy)). A verbatim copy would make
  every doc an exact/near duplicate of its 9 clones and turn the dedup
  benches into a different (quadratic-in-copies) workload; shuffling
  words preserves length/vocab/token distributions while giving
  near-zero cross-copy shingle overlap. copy 0 keeps original text, so
  the original near-dup structure survives once. n_chars is recomputed.
- embeddings: copy 0 verbatim; copies 1..N-1 resample each dimension
  by an independent per-copy permutation of that dimension's empirical
  values (preserves per-dimension marginals; destroys cross-copy
  cosine similarity, so near-dup pair counts scale ~linearly like a
  real corpus instead of every vector gaining N-1 clones).

Usage: python scripts/make_scale_data.py OUTDIR [N]   (default N=10)
"""
from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
STRIDE = 10**7  # > every key in sf0.1 (max o_orderkey ~ 6e5)

KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def replicate_keyed(con, out: Path, n: int) -> None:
    for tbl, keys in KEYED.items():
        src = f"read_parquet('{SRC}/{tbl}.parquet')"
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        parts = []
        for i in range(n):
            sel = ", ".join(
                f"({c} + {i * STRIDE})::BIGINT AS {c}" if c in keys else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM {src}")
        union = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({union}) TO '{out / (tbl + '.parquet')}' (FORMAT PARQUET)"
        )
        print(f"  {tbl}: x{n}")


def replicate_documents(out: Path, n: int) -> None:
    df = pd.read_parquet(f"{SRC}/documents.parquet")
    copies = [df]
    for i in range(1, n):
        c = df.copy()
        c["doc_id"] = c["doc_id"] + i * STRIDE

        def shuf(args):
            text, doc_id = args
            words = text.split(" ")
            random.Random(int(doc_id) * 1000 + i * 10 + 42).shuffle(words)
            return " ".join(words)

        c["text"] = list(map(shuf, zip(df["text"], df["doc_id"])))
        c["n_chars"] = c["text"].str.len().astype("int64")
        copies.append(c)
    # small row groups: a single pandas-default row group would serialize
    # the whole scan into one Spark task and measure IO, not the query
    pd.concat(copies, ignore_index=True).to_parquet(
        out / "documents.parquet", index=False, row_group_size=2048
    )
    print(f"  documents: x{n} (word-shuffled copies)")


def replicate_embeddings(out: Path, n: int) -> None:
    df = pd.read_parquet(f"{SRC}/embeddings.parquet")
    mat = np.stack(df["embedding"].to_numpy())
    dtype = mat.dtype
    copies = [df]
    for i in range(1, n):
        rng = np.random.default_rng(42_000 + i)
        m = mat.copy()
        for d in range(m.shape[1]):
            m[:, d] = m[rng.permutation(m.shape[0]), d]
        c = df.copy()
        c["vec_id"] = c["vec_id"] + i * STRIDE
        c["embedding"] = [row.astype(dtype) for row in m]
        copies.append(c)
    pd.concat(copies, ignore_index=True).to_parquet(
        out / "embeddings.parquet", index=False, row_group_size=2048
    )
    print(f"  embeddings: x{n} (per-dim resampled copies)")


def main() -> None:
    out = Path(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for tbl in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')) "
            f"TO '{out / (tbl + '.parquet')}' (FORMAT PARQUET)"
        )
    replicate_keyed(con, out, n)
    replicate_documents(out, n)
    replicate_embeddings(out, n)
    print(f"done: {out} (sf{0.1 * n:g})")


if __name__ == "__main__":
    main()

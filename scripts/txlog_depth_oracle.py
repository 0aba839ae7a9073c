"""Oracle-at-scale for the txlog family with a LONG history (VERDICT
r9 ask #4): build a 1,000-commit transactional table over the sf1
orders data (1.5M rows) while a DuckDB SHADOW table replays the exact
same operation stream, then verify the engine against the shadow's
materialized snapshots:

  - TIME TRAVEL: every ~100 commits the shadow is materialized
    (CREATE TABLE snap_<v>); after the build, the engine's
    read(version=v) must match each snapshot — aggregate-exact
    (count / SUM(price) as DECIMAL / SUM,MIN,MAX(key)) AND value-exact
    on a deterministic row sample (o_orderkey % 97 == 0, all columns,
    sorted) — including snapshots on BOTH sides of a mid-history
    column rename (the time-travel read must surface the old name).
  - POINT LOOKUP: Bloom-pruned equality reads at head for sampled
    keys must match the shadow row-for-row.
  - The operation stream mixes appends (orderkey range slices), range-
    pruned DELETE/UPDATE, full-table MERGE upserts, compactions, a
    schema rename, and a CHECK-constraint declaration — the same op
    families the driver-green txlog_* rows exercise at 2-3 commits,
    here at depth 1,000.

Usage: python scripts/txlog_depth_oracle.py [SF_DIR] [DEPTH] [ROOT]
  SF_DIR default /tmp/scale_sf1 (falls back to /root/testdata/sf0.1)
Prints per-snapshot verdicts; exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.session import get_spark
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import TxTable

SNAP_EVERY = 100
SAMPLE_MOD = 97


def main() -> int:
    default_sf = (
        "/tmp/scale_sf1"
        if os.path.exists("/tmp/scale_sf1/orders.parquet")
        else "/root/testdata/sf0.1"
    )
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else default_sf
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    root = sys.argv[3] if len(sys.argv) > 3 else None
    cleanup = root is None
    if root is None:
        root = tempfile.mkdtemp(prefix="txlog_depth_oracle_")

    from pyspark.sql import functions as F

    spark = get_spark(
        app_name="txlog-depth-oracle", cpus=16, shuffle_partitions=16
    )
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'orders.parquet')}')"
    )
    con.execute("CREATE TABLE shadow AS SELECT * FROM src WHERE 1=0")

    # RANK-based slice boundaries, not raw key ranges: the sf1 orderkey
    # space is dense blocks separated by huge gaps, so equal-width key
    # slices would be mostly empty. Taking the key at every
    # (total/depth)-th rank gives every slice exactly the same row
    # count while every append/DML predicate stays a pure literal key
    # RANGE — so the engine's range_filter pruning hints remain valid
    # and DuckDB applies byte-identical predicates.
    total, max_key = con.execute(
        "SELECT count(*), max(o_orderkey) FROM src"
    ).fetchone()
    rps = total // depth  # rows per slice
    sub = max(rps // 3, 1)
    wanted = sorted(
        {i * rps for i in range(depth)}
        | {i * rps + sub for i in range(depth)}
        | {i * rps + 2 * sub for i in range(depth)}
    )
    key_at = dict(
        con.execute(
            "WITH r AS (SELECT o_orderkey AS k, "
            "row_number() OVER (ORDER BY o_orderkey) - 1 AS rn FROM src) "
            f"SELECT rn, k FROM r WHERE rn IN ({','.join(map(str, wanted))})"
        ).fetchall()
    )
    B = [key_at[i * rps] for i in range(depth)] + [max_key + 1]
    T = [key_at[i * rps + sub] for i in range(depth)]
    U = [key_at[i * rps + 2 * sub] for i in range(depth)]

    t = TxTable(
        spark,
        root,
        stats_columns=["o_orderkey"],
        bloom_columns=["o_orderkey"],
        checkpoint_interval=10,
    )

    pcol = "o_orderpriority"  # renamed mid-history
    snapshots: list[tuple[int, str, str]] = []  # (engine_version, snap_table, pcol-at-time)
    t0 = time.time()
    for i in range(depth):
        lo, hi = B[i], B[i + 1]
        op = i % 50
        if i == depth // 2 and pcol == "o_orderpriority":
            t.rename_column("o_orderpriority", "priority_class")
            con.execute(
                "ALTER TABLE shadow RENAME o_orderpriority TO priority_class"
            )
            pcol = "priority_class"
        elif i == depth // 4:
            t.set_constraints({"key_nonneg": "o_orderkey >= 0"})
        elif i in (depth // 3, 2 * depth // 3, depth - 1):
            t.compact()
        elif op == 20 and i > 2:
            # range-pruned DELETE of the previous slice's first third
            dlo, dhi = B[i - 1], T[i - 1]
            t.delete(
                f"o_orderkey >= {dlo} AND o_orderkey < {dhi}",
                range_filter={"o_orderkey": (dlo, dhi - 1)},
            )
            con.execute(
                f"DELETE FROM shadow WHERE o_orderkey >= {dlo} "
                f"AND o_orderkey < {dhi}"
            )
        elif op == 35 and i > 2:
            ulo, uhi = U[i - 1], B[i]
            t.update(
                f"o_orderkey >= {ulo} AND o_orderkey < {uhi}",
                {"o_totalprice": "o_totalprice + 1.0"},
                range_filter={"o_orderkey": (ulo, uhi - 1)},
            )
            con.execute(
                f"UPDATE shadow SET o_totalprice = o_totalprice + 1.0 "
                f"WHERE o_orderkey >= {ulo} AND o_orderkey < {uhi}"
            )
        elif op == 45 and i > 10:
            # MERGE upsert: halve the price of an old slice region
            # (full-head overwrite semantics; keys the i-20 DELETE
            # removed get re-inserted by the merge on both sides)
            mlo, mhi = B[i - 10], T[i - 10]
            up = (
                src.filter(
                    (F.col("o_orderkey") >= mlo) & (F.col("o_orderkey") < mhi)
                )
                .withColumn("o_totalprice", F.col("o_totalprice") * 0.5)
            )
            if pcol != "o_orderpriority":
                up = up.withColumnRenamed("o_orderpriority", pcol)
            t.merge(up, ["o_orderkey"])
            con.execute(
                f"DELETE FROM shadow WHERE o_orderkey >= {mlo} "
                f"AND o_orderkey < {mhi}"
            )
            con.execute(
                f"INSERT INTO shadow SELECT * REPLACE "
                f"(o_totalprice * 0.5 AS o_totalprice) FROM src "
                f"WHERE o_orderkey >= {mlo} AND o_orderkey < {mhi}"
            )
        else:
            batch = src.filter(
                (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
            )
            if pcol != "o_orderpriority":
                batch = batch.withColumnRenamed("o_orderpriority", pcol)
            t.append(batch.coalesce(1))
            con.execute(
                f"INSERT INTO shadow SELECT * FROM src "
                f"WHERE o_orderkey >= {lo} AND o_orderkey < {hi}"
            )
        if (i + 1) % SNAP_EVERY == 0 or i == depth - 1:
            v = t.current_version()
            snap = f"snap_v{v}"
            con.execute(f"CREATE TABLE {snap} AS SELECT * FROM shadow")
            snapshots.append((v, snap, pcol))
        if (i + 1) % 100 == 0:
            n = con.execute("SELECT count(*) FROM shadow").fetchone()[0]
            print(
                f"  commit {i + 1:4d}/{depth} v={t.current_version()} "
                f"shadow_rows={n} elapsed={time.time() - t0:.0f}s",
                flush=True,
            )

    failures: list[str] = []

    def compare_frames(sdf, odf, label):
        cols = sorted(sdf.columns)
        if sorted(odf.columns) != cols:
            failures.append(f"{label}: columns {sorted(odf.columns)} vs {cols}")
            return
        if len(sdf) != len(odf):
            failures.append(f"{label}: rows {len(sdf)} vs {len(odf)}")
            return
        a = sdf[cols].sort_values(cols, ignore_index=True)
        b = odf[cols].sort_values(cols, ignore_index=True)
        for c in cols:
            if a[c].tolist() != b[c].tolist():
                failures.append(f"{label}: column {c} differs")
                return

    # --- time travel to every materialized snapshot -------------------
    for v, snap, col_at_v in snapshots:
        eng = t.read(version=v)
        agg_e = (
            eng.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
                .cast("string")
                .alias("sp"),
                F.sum("o_orderkey").alias("sk"),
                F.min("o_orderkey").alias("mn"),
                F.max("o_orderkey").alias("mx"),
            ).collect()[0]
        )
        agg_o = con.execute(
            f"SELECT CAST(count(*) AS BIGINT), "
            f"CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR), "
            f"CAST(SUM(o_orderkey) AS BIGINT), MIN(o_orderkey), "
            f"MAX(o_orderkey) FROM {snap}"
        ).fetchone()
        agg_ok = (
            agg_e["n"] == agg_o[0]
            and str(agg_e["sp"]) == str(agg_o[1])
            and agg_e["sk"] == agg_o[2]
            and agg_e["mn"] == agg_o[3]
            and agg_e["mx"] == agg_o[4]
        )
        if not agg_ok:
            failures.append(
                f"v{v}: aggregates differ engine={tuple(agg_e)} oracle={agg_o}"
            )
        sdf = eng.filter(F.col("o_orderkey") % SAMPLE_MOD == 0).toPandas()
        odf = con.execute(
            f"SELECT * FROM {snap} WHERE o_orderkey % {SAMPLE_MOD} = 0"
        ).fetch_df()
        pre = len(failures)
        compare_frames(sdf, odf, f"v{v} sample")
        schema_note = "old-name" if col_at_v == "o_orderpriority" else "renamed"
        print(
            f"time-travel v{v:4d}: "
            f"{'EXACT' if agg_ok and len(failures) == pre else 'MISMATCH'} "
            f"(rows={agg_e['n']}, sample={len(sdf)}, schema={schema_note})",
            flush=True,
        )

    # --- Bloom point lookups at head ----------------------------------
    keys = [
        r[0]
        for r in con.execute(
            f"SELECT o_orderkey FROM shadow WHERE o_orderkey % 1009 = 0 "
            f"ORDER BY o_orderkey LIMIT 5"
        ).fetchall()
    ]
    for k in keys:
        t0p = time.perf_counter()
        sdf = (
            t.read(equality_filter={"o_orderkey": int(k)})
            .filter(F.col("o_orderkey") == int(k))
            .toPandas()
        )
        el = time.perf_counter() - t0p
        odf = con.execute(
            f"SELECT * FROM shadow WHERE o_orderkey = {k}"
        ).fetch_df()
        pre = len(failures)
        compare_frames(sdf, odf, f"point lookup {k}")
        print(
            f"point-lookup key={k}: "
            f"{'EXACT' if len(failures) == pre else 'MISMATCH'} "
            f"({len(sdf)} rows, {el * 1000:.0f} ms)",
            flush=True,
        )

    print(
        f"\nSUMMARY depth={depth} sf_dir={sf_dir} "
        f"snapshots={len(snapshots)} lookups={len(keys)} "
        f"bad={len(failures)}"
    )
    for f in failures:
        print("  " + f)
    spark.stop()
    if cleanup:
        shutil.rmtree(root, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

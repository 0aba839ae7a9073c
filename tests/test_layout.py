"""Z-order layout tests: the clustered write must tighten per-row-group
min/max extents in EVERY interleaved dimension (that tightness IS the
data-skipping win), verified against the parquet footer stats the
pruning actually uses."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.layout import (
    zorder_layout,
    zorder_value,
)


def _avg_rowgroup_extent(path: str, col: str, lo: float, hi: float) -> float:
    """Mean normalized (max-min) of ``col`` across all row groups of
    all parquet files under ``path`` — 1.0 means every row group spans
    the whole value range (no pruning possible), ~0 means tight."""
    spans, full = [], float(hi - lo)
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, fname)).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[col]
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            spans.append((st.max - st.min) / full)
    assert spans, f"no row groups found under {path}"
    return sum(spans) / len(spans)


def test_zorder_value_interleaves_bits(spark):
    df = spark.range(1).select(
        zorder_value([F.lit(0b101).cast("long"), F.lit(0b011).cast("long")], 3).alias(
            "z"
        )
    )
    # x=0b101, y=0b011 -> bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1
    assert df.first()["z"] == 0b011011


def test_zorder_layout_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """Write orders clustered by (o_custkey, o_totalprice) and assert
    every row group is tight in BOTH columns — a plain single-column
    sort leaves the second dimension's extent near 1.0."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lo_k, hi_k, lo_p, hi_p = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()

    zpath = str(tmp_path / "zordered")
    zorder_layout(orders, ["o_custkey", "o_totalprice"], num_partitions=32).write.mode(
        "overwrite"
    ).parquet(zpath)
    assert spark.read.parquet(zpath).count() == orders.count()

    spath = str(tmp_path / "keysorted")
    orders.repartitionByRange(32, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.mode("overwrite").parquet(spath)

    z_key = _avg_rowgroup_extent(zpath, "o_custkey", lo_k, hi_k)
    z_price = _avg_rowgroup_extent(zpath, "o_totalprice", lo_p, hi_p)
    s_price = _avg_rowgroup_extent(spath, "o_totalprice", lo_p, hi_p)

    # z-order: both dimensions tight enough to prune most of the table
    # (32 row groups -> a contiguous 1/32 of the curve spans ~1/4 of
    # each dimension at worst alignment)
    assert z_key < 0.5, z_key
    assert z_price < 0.5, z_price
    # the single-key sort can't localize the second column; z-order
    # must beat it decisively there
    assert z_price < s_price / 2, (z_price, s_price)


def test_zorder_layout_constant_and_null_columns(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 5.0)], "a int, b double"
    )
    out = zorder_layout(df, ["a", "b"], bits=4, num_partitions=2)
    assert out.count() == 3
    assert "__z" not in out.columns


def test_quantize_monotone_clamped_and_null_to_zero(spark):
    """The production quantizer's contract: monotone in the value,
    clamped to [0, 2^bits), NULL -> bucket 0, constant column -> 0."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.layout import (
        _quantize,
    )

    df = spark.createDataFrame(
        [(0.0,), (2.5,), (5.0,), (10.0,), (None,)], "v double"
    )
    got = [
        r["q"]
        for r in df.select(_quantize(F.col("v"), 0.0, 10.0, 4).alias("q")).collect()
    ]
    assert got[0] == 0 and got[3] == 15 and got[4] == 0  # clamp ends + NULL
    assert got == sorted(got[:4]) + [0]  # monotone over the non-null prefix
    # constant column: everything lands in bucket 0
    const = df.select(_quantize(F.col("v"), 5.0, 5.0, 4).alias("q")).collect()
    assert all(r["q"] == 0 for r in const)


def test_zorder_layout_empty_and_all_null_inputs(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.layout import (
        zorder_layout,
    )

    empty = spark.createDataFrame([], "a double, b double")
    assert zorder_layout(empty, ["a", "b"], num_partitions=2).count() == 0
    nulls = spark.createDataFrame([(None, None), (None, None)], "a double, b double")
    assert zorder_layout(nulls, ["a", "b"], num_partitions=2).count() == 2


def test_zorder_value_rejects_long_overflow(spark):
    """bits * ncols > 63 would hit the JVM's mod-64 shift wrap and
    silently scramble the key; it must raise instead."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.layout import (
        zorder_value,
    )

    cols = [F.lit(i).cast("long") for i in range(7)]
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_value(cols, bits=10)  # 70 interleaved bits
    # 9 bits x 7 cols = 63 still fits
    zorder_value(cols, bits=9)

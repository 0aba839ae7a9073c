"""Skew diagnostics: the numbers that pick salting / AQE / broadcast
strategies must be exact and the plans must not themselves skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.diagnostics import (
    heavy_hitters,
    skew_profile,
)


def _skewed_df(spark):
    # 1000 rows of key 0, one row each of keys 1..100
    hot = spark.range(1000).select(F.lit(0).alias("k"))
    cold = spark.range(1, 101).select(F.col("id").cast("int").alias("k"))
    return hot.union(cold)


def test_heavy_hitters_exact_counts_and_shares(spark):
    df = _skewed_df(spark)
    top = heavy_hitters(df, "k", k=3).collect()
    assert top[0]["k"] == 0 and top[0]["n"] == 1000
    assert abs(top[0]["share"] - 1000 / 1100) < 1e-12
    # ties among cold keys break deterministically by key ascending
    assert [r["k"] for r in top[1:]] == [1, 2]


def test_skew_profile_summary(spark):
    row = skew_profile(_skewed_df(spark), "k", k=10).first()
    assert row["n_rows"] == 1100 and row["n_keys"] == 101
    assert row["max_n"] == 1000 and row["p50_n"] == 1
    assert abs(row["max_share"] - 1000 / 1100) < 1e-12
    # hottest 10 = 1000 + 9 singletons
    assert abs(row["top10_share"] - 1009 / 1100) < 1e-12


def test_no_window_over_key_in_plans(spark):
    """Counting a hot key must never congregate its rows: no Window,
    no global Sort before the aggregate."""
    df = _skewed_df(spark)
    for frame in (heavy_hitters(df, "k"), skew_profile(df, "k")):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
    top_plan = heavy_hitters(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in top_plan, top_plan


def test_uniform_key_reads_as_unskewed(spark, sf_dir):
    row = skew_profile(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), "l_orderkey"
    ).first()
    # order keys are near-uniform: p99/p50 stays single-digit and no
    # key holds a meaningful share
    assert row["p99_n"] <= row["p50_n"] * 10
    assert row["max_share"] < 0.01


def test_observe_metrics_batch(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.diagnostics import (
        observe_metrics,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, v string"
    )
    out, obs = observe_metrics(df, "health", null_cols=["v"],
                               extra={"max_id": F.max("id")})
    out.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == 3 and got["nulls_v"] == 1 and got["max_id"] == 3


def test_observe_metrics_streaming(spark, tmp_path):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.diagnostics import (
        observe_metrics,
    )

    src = str(tmp_path / "obs_src")
    spark.createDataFrame([(i, None if i % 3 == 0 else "x") for i in range(30)],
                          "id long, v string").write.parquet(src)
    stream = spark.readStream.schema("id long, v string").parquet(src)
    out, obs = observe_metrics(stream, "health", null_cols=["v"])
    assert obs is None
    q = (out.writeStream.format("noop").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p and p["observedMetrics"]]
    m = progresses[-1]["observedMetrics"]["health"]
    assert m["n_rows"] == 30 and m["nulls_v"] == 10

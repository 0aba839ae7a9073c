"""Tests for the scalar/array function helpers and the job lifecycle
(argv parsing + bookmark commit buffering)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark import functions as EF
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.job import (
    Job,
    JobArgumentError,
    get_resolved_options,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.catalog import WarehouseCatalog


@pytest.fixture(scope="module")
def arr_df(spark):
    return spark.createDataFrame(
        [(1, [10, 20, 30]), (2, [7]), (3, [])],
        "id long, xs array<int>",
    )


def test_replace_array_element(arr_df):
    out = {
        r.id: r.ys
        for r in arr_df.select(
            "id", EF.replace_array_element("xs", F.lit(99), 1).alias("ys")
        ).collect()
    }
    assert out[1] == [10, 99, 30]
    assert out[2] == [7]  # idx out of range → unchanged
    assert out[3] == []


def test_replace_array_element_head_and_tail(arr_df):
    row = (
        arr_df.filter("id = 1")
        .select(
            EF.replace_array_element("xs", F.lit(0), 0).alias("h"),
            EF.replace_array_element("xs", F.lit(0), 2).alias("t"),
        )
        .first()
    )
    assert row.h == [0, 20, 30]
    assert row.t == [10, 20, 0]


def test_named_struct(spark):
    df = spark.createDataFrame([(1, "a")], "x long, y string")
    row = df.select(EF.named_struct(k="x", v="y").alias("s")).first()
    assert row.s.k == 1 and row.s.v == "a"


def test_explode_with_index(arr_df):
    rows = EF.explode_with_index(arr_df.filter("id = 1"), "xs").collect()
    assert [(r["index"], r["val"]) for r in rows] == [(0, 10), (1, 20), (2, 30)]
    # empty arrays produce no rows
    assert EF.explode_with_index(arr_df.filter("id = 3"), "xs").count() == 0


def test_get_resolved_options_basic():
    got = get_resolved_options(
        ["--JOB_NAME", "j1", "--src", "s3://in", "--dst", "wh"],
        ["src", "dst"],
    )
    assert got["src"] == "s3://in" and got["dst"] == "wh"
    assert got["JOB_NAME"] == "j1"


def test_get_resolved_options_tempdir_alias():
    got = get_resolved_options(["--TempDir", "/tmp/x", "--a", "1"], ["a"])
    assert got["temp_dir"] == "/tmp/x" and got["TempDir"] == "/tmp/x"


def test_get_resolved_options_missing_required():
    with pytest.raises(SystemExit):
        get_resolved_options(["--a", "1"], ["a", "b"])


def test_get_resolved_options_reserved_rejected():
    with pytest.raises(JobArgumentError):
        get_resolved_options([], ["JOB_NAME"])


def test_job_commit_buffers_watermarks(spark, tmp_path):
    cat = WarehouseCatalog(spark, str(tmp_path))
    job = Job(cat)
    df = spark.createDataFrame([(1, "2024-01-05"), (2, "2024-01-09")], "id long, d string")
    job.init("job1")
    job.record("orders", df, "d")
    # nothing persisted until commit — a failed job leaves no bookmark
    assert cat.get_bookmark("orders") is None
    job.commit()
    assert cat.get_bookmark("orders") == "2024-01-09"
    # incremental read now filters at the watermark
    assert cat.incremental_read(df, "orders", "d").count() == 0


def test_job_commit_before_init_raises(spark, tmp_path):
    job = Job(WarehouseCatalog(spark, str(tmp_path)))
    with pytest.raises(RuntimeError):
        job.commit()


def test_get_logger_idempotent_and_configured():
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.job import get_logger

    l1 = get_logger()
    l2 = get_logger()
    assert l1 is l2
    assert len(l1.handlers) == 1  # repeated calls never stack handlers
    assert not l1.propagate

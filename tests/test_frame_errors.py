from __future__ import annotations

import pytest
from pyspark.sql import types as T

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.frame import EngineFrame, FrameCollection


@pytest.fixture()
def frame(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k int, v string"
    )
    return EngineFrame(df, name="t")


def test_filter_drop_vs_flag_semantics(frame):
    def f(row):
        if row["k"] == 1:
            raise ValueError("silently dropped")  # KeyError/ValueError/TypeError drop
        if row["k"] == 2:
            raise RuntimeError("kept + flagged")  # other exceptions keep the row
        return row["k"] % 2 == 1

    out = frame.filter(f)
    kept = sorted(r.k for r in out.df.collect())
    # 1 dropped (ValueError), 2 kept-as-error, 3 passes predicate, 4 fails it
    assert kept == [2, 3]
    errs = out.errors_frame().collect()
    assert len(errs) == 1 and "RuntimeError" in errs[0].error_message
    assert out.errors_count() == 1


def test_map_none_and_exception_to_error_channel(frame):
    def f(row):
        if row["k"] == 2:
            return None  # None return → error (:106-115)
        if row["k"] == 3:
            raise RuntimeError("boom")
        return {"k2": row["k"] * 10, "tag": (row["v"] or "?").upper()}

    out = frame.map(f, "k2 int, tag string")
    data = sorted((r.k2, r.tag) for r in out.df.collect())
    assert data == [(10, "A"), (40, "?")]
    errs = out.errors_frame().collect()
    assert len(errs) == 2
    assert {e.stage for e in errs} == {"map"}
    # original record is preserved in the channel
    assert any('"k": 3' in e.record for e in errs)


def test_error_accumulation_across_stages(frame):
    def bad_filter(row):
        if row["k"] == 1:
            raise RuntimeError("x")
        return True

    def bad_map(row):
        if row["k"] == 2:
            raise RuntimeError("y")
        return {"k": row["k"]}

    out = frame.filter(bad_filter).map(bad_map, "k int")
    assert out.errors_count() == 2
    with pytest.raises(RuntimeError, match="totalThreshold"):
        out.assert_error_threshold(1)
    out.assert_error_threshold(2)  # at threshold: ok


def test_stage_threshold(frame):
    def f(row):
        raise RuntimeError("always")

    with pytest.raises(RuntimeError, match="stageThreshold"):
        frame.filter(f, stage_threshold=1)


def test_collection_select_missing_is_empty(spark):
    df = spark.createDataFrame([(1,)], "a int")
    coll = FrameCollection({"x": df})
    assert coll.select("x").count() == 1
    missing = coll.select("nope")
    assert missing.count() == 0 and missing.schema == T.StructType([])


def test_collection_map_flatmap(spark):
    df = spark.createDataFrame([(1,), (2,)], "a int")
    coll = FrameCollection({"x": df})
    doubled = coll.map_frames(lambda d, k: d.limit(1))
    assert doubled["x"].count() == 1
    flat = coll.flatmap(lambda d, k: {f"{k}_even": d.filter("a % 2 = 0"), f"{k}_odd": d.filter("a % 2 = 1")})
    assert sorted(flat.keys()) == ["x_even", "x_odd"]


def test_map_partitions_running_total(frame):
    def per_partition(rows):
        total = 0
        for r in rows:
            total += r["k"]
            yield {"k": r["k"], "running": total}

    out = frame.df.repartition(2)
    got = EngineFrame(out, name="t").map_partitions(per_partition, "k int, running int")
    rows = got.df.collect()
    assert sorted(r.k for r in rows) == [1, 2, 3, 4]
    # each partition's last running value equals that partition's sum
    assert sum(r.k for r in rows) == 10


def test_map_partitions_with_index(frame):
    def tag(pid, rows):
        for r in rows:
            yield {"k": r["k"], "pid": pid}

    got = EngineFrame(frame.df.repartition(3), name="t").map_partitions_with_index(
        tag, "k int, pid int"
    )
    rows = got.df.collect()
    assert len(rows) == 4
    assert all(0 <= r.pid < 3 for r in rows)
    assert len({r.pid for r in rows}) >= 2  # index actually varies by partition


def test_map_partitions_preserves_error_channel(frame):
    def bad(row):
        raise RuntimeError("boom")

    with_errs = frame.filter(bad)  # 4 flagged rows
    out = with_errs.map_partitions(lambda rows: iter(list(rows)), "k int, v string")
    assert out.errors_count() == with_errs.errors_count() == 4

"""Data-quality expectations (operators/expectations.py): split
semantics, per-rule attribution, NULL-as-violation, observe metrics,
and the fail gate."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.expectations import (
    ExpectationsFailed,
    check_expectations,
)


def _orders(spark):
    return spark.createDataFrame(
        [
            Row(order_id=1, price=10.0, status="O"),
            Row(order_id=2, price=-5.0, status="O"),     # bad price
            Row(order_id=3, price=7.0, status="X"),      # bad status
            Row(order_id=4, price=None, status="F"),     # NULL price -> violation
            Row(order_id=5, price=1.0, status="P"),
        ]
    )


def RULES():
    return {
        "positive_price": F.col("price") > 0,
        "known_status": F.col("status").isin("O", "F", "P"),
    }


def test_quarantine_splits_and_names_failed_rules(spark):
    valid, quarantined, obs = check_expectations(_orders(spark), RULES())
    assert sorted(r.order_id for r in valid.collect()) == [1, 5]
    q = {r.order_id: sorted(r.failed_expectations) for r in quarantined.collect()}
    assert q == {
        2: ["positive_price"],
        3: ["known_status"],
        4: ["positive_price"],
    }
    # metrics ride the same pass: available after the action above
    m = obs.get
    assert m["rows_total"] == 5 and m["rows_failed"] == 3
    assert m["failed_positive_price"] == 2 and m["failed_known_status"] == 1


def test_drop_returns_valid_only(spark):
    valid, quarantined, _ = check_expectations(
        _orders(spark), RULES(), on_violation="drop"
    )
    assert quarantined is None
    assert valid.count() == 2


def test_fail_raises_with_violations_and_passes_clean(spark):
    with pytest.raises(ExpectationsFailed, match="3 row"):
        check_expectations(_orders(spark), RULES(), on_violation="fail")
    clean = _orders(spark).filter(F.col("order_id").isin(1, 5))
    out, none_q, obs = check_expectations(clean, RULES(), on_violation="fail")
    assert none_q is None and out.count() == 2
    assert obs.get["rows_failed"] == 0


def test_unknown_action_rejected(spark):
    with pytest.raises(ValueError, match="unknown on_violation"):
        check_expectations(_orders(spark), RULES(), on_violation="explode")

"""Unit tests for bench.py's sitting self-qualification (VERDICT r12
ask #3): the warm-pass spread math that decides whether a bench
sitting's artifact self-reports as qualifying under BASELINE.md's
warm-pass-agreement rule. Pure math — no SparkSession."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import WARM_SPREAD_QUALIFY, warm_pass_spread


def test_qualifying_sitting_from_r12_adjudication():
    # the judge's qualifying r12 sitting: passes 60.0 / 44.3 / 41.4,
    # warm agreement ~7% — inside the threshold
    spread = warm_pass_spread([60.0, 44.3, 41.4])
    assert spread == pytest.approx((44.3 - 41.4) / 41.4)
    assert spread <= WARM_SPREAD_QUALIFY


def test_disqualified_noise_sitting_from_bench_r12():
    # the driver's BENCH_r12 sitting: passes 66.4 / 55.4 / 69.1 —
    # 25% warm spread, the host-noise signature the rule exists for
    spread = warm_pass_spread([66.4, 55.4, 69.1])
    assert spread == pytest.approx((69.1 - 55.4) / 55.4)
    assert spread > WARM_SPREAD_QUALIFY


def test_first_pass_jit_is_excluded():
    # a huge pass-1 (whole-stage-codegen JIT) must not disqualify a
    # sitting whose warm passes agree
    assert warm_pass_spread([127.0, 37.0, 37.0]) == 0.0


def test_too_few_passes_yields_none():
    assert warm_pass_spread([42.0]) is None
    assert warm_pass_spread([42.0, 40.0]) is None
    assert warm_pass_spread([]) is None


def test_degenerate_zero_total_yields_none():
    # an all-errored pass produces a 0.0 total; spread is undefined,
    # not a division-by-zero crash
    assert warm_pass_spread([10.0, 0.0, 5.0]) is None


def test_threshold_boundary_is_inclusive():
    # exactly at the threshold qualifies (<=, not <)
    warm_lo, warm_hi = 40.0, 40.0 * (1 + WARM_SPREAD_QUALIFY)
    spread = warm_pass_spread([99.0, warm_lo, warm_hi])
    assert spread == pytest.approx(WARM_SPREAD_QUALIFY)
    assert spread <= WARM_SPREAD_QUALIFY

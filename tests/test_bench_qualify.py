"""Unit tests for bench.py's sitting self-qualification (VERDICT r12
ask #3): the warm-pass spread math that decides whether a bench
sitting's artifact self-reports as qualifying under BASELINE.md's
warm-pass-agreement rule. Pure math — no SparkSession."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    CANARY_BASELINE_SF01,
    CANARY_INFLATED_RATIO,
    CANARY_QUERY,
    WARM_SPREAD_QUALIFY,
    sitting_verdict,
    warm_pass_spread,
)


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


# --- absolute load canary (VERDICT r13 ask #2) ---


def test_bench_r13_sustained_load_sitting_now_disqualifies():
    # the exact blind spot the canary closes: BENCH_r13 read 98.8 s at
    # 8% warm spread (qualifies under the old rule) with
    # top_orders_by_value at 0.72 s — 4.2x the r10 basis, 3.1x the
    # current basis, far over the threshold under either table
    canary_ratio = round(0.72 / CANARY_BASELINE_SF01, 4)
    qualifies, load_inflated = sitting_verdict(0.08, canary_ratio, True)
    assert load_inflated is True
    assert qualifies is False


def test_calm_sitting_passes_both_gates():
    qualifies, load_inflated = sitting_verdict(0.05, 1.0, True)
    assert load_inflated is False
    assert qualifies is True


def test_canary_threshold_boundary_is_inclusive():
    # exactly at the inflation threshold still qualifies (>, not >=)
    qualifies, load_inflated = sitting_verdict(0.05, CANARY_INFLATED_RATIO, True)
    assert load_inflated is False
    assert qualifies is True
    qualifies, load_inflated = sitting_verdict(
        0.05, CANARY_INFLATED_RATIO + 0.0001, True
    )
    assert load_inflated is True
    assert qualifies is False


def test_missing_canary_at_judged_sf_cannot_certify():
    # canary errored in every pass at sf0.1: load cannot be certified,
    # the sitting must not self-report as qualifying
    qualifies, load_inflated = sitting_verdict(0.05, None, True)
    assert load_inflated is None
    assert qualifies is False


def test_non_judged_sf_stays_spread_only():
    # at sf != 0.1 there is no pinned canary basis: spread-only rule
    qualifies, load_inflated = sitting_verdict(0.05, None, False)
    assert load_inflated is None
    assert qualifies is True
    qualifies, _ = sitting_verdict(0.25, None, False)
    assert qualifies is False


def test_bad_spread_fails_even_with_calm_canary():
    # bursty noise (the original rule's territory) still disqualifies
    qualifies, load_inflated = sitting_verdict(0.25, 1.0, True)
    assert load_inflated is False
    assert qualifies is False


def test_verdict_judged_on_rounded_spread():
    # ADVICE r13: the artifact rounds warm_spread to 4 decimals; the
    # flag must be judged on the same rounded value so a reader
    # recomputing from the JSON always agrees. 0.10004 rounds to 0.1
    # which is <= the threshold — the artifact says 0.1/qualifies=true.
    rounded = round(0.10004, 4)
    qualifies, _ = sitting_verdict(rounded, 1.0, True)
    assert qualifies is True


def test_canary_is_a_pinned_benchmark_query():
    from bench import BENCH_QUERIES

    assert CANARY_QUERY in BENCH_QUERIES


# --- hypervisor steal-time cross-check (r14) ---


def test_steal_gate_disqualifies_contended_sitting():
    # measured this round: 16.9% steal during a probe window whose
    # sitting read ~1.4x baseline with 0.2% warm spread — both older
    # gates blind (spread agrees, and a lucky canary median could pass)
    from bench import STEAL_INFLATED

    qualifies, load_inflated = sitting_verdict(0.002, 1.2, True, 0.169)
    assert load_inflated is True
    assert qualifies is False
    assert 0.169 > STEAL_INFLATED


def test_steal_floor_passes():
    # idle/uncontended floor measured at 0.0-0.2%
    qualifies, load_inflated = sitting_verdict(0.05, 1.0, True, 0.002)
    assert load_inflated is False
    assert qualifies is True


def test_steal_unreadable_falls_back_to_canary_gate():
    # off-Linux (no /proc/stat): canary-only, exactly the pre-steal rule
    qualifies, load_inflated = sitting_verdict(0.05, 1.0, True, None)
    assert load_inflated is False
    assert qualifies is True


def test_non_judged_sf_uses_steal_only_load_check():
    # sf1 sitting: no canary basis, but steal is SF-independent
    qualifies, load_inflated = sitting_verdict(0.05, None, False, 0.169)
    assert load_inflated is True
    assert qualifies is False
    qualifies, load_inflated = sitting_verdict(0.05, None, False, 0.002)
    assert load_inflated is False
    assert qualifies is True


def test_steal_fraction_math():
    from bench import read_proc_stat, steal_fraction

    assert steal_fraction((100, 1000), (150, 2000)) == pytest.approx(0.05)
    assert steal_fraction(None, (150, 2000)) is None
    assert steal_fraction((100, 1000), (100, 1000)) is None  # zero window
    snap = read_proc_stat()
    if snap is not None:  # Linux: sane live values
        steal, total = snap
        assert 0 <= steal <= total


# --- r15: per-pass steal gate + self-describing artifacts -----------


def test_single_contended_pass_disqualifies_despite_clean_average():
    # ADVICE r14: one 14%-steal pass among three near-zero ones keeps
    # the whole-sitting average under 5% (≈4.7%) yet skews that pass's
    # per-query timings — the per-pass maximum must trip the gate
    qualifies, load_inflated = sitting_verdict(
        0.05, 1.0, True, 0.047, max_pass_steal_pct=0.14
    )
    assert load_inflated is True
    assert qualifies is False


def test_per_pass_steal_floor_passes():
    qualifies, load_inflated = sitting_verdict(
        0.05, 1.0, True, 0.002, max_pass_steal_pct=0.004
    )
    assert load_inflated is False
    assert qualifies is True


def test_per_pass_steal_gate_applies_at_non_judged_sf():
    # sf1 sitting (no canary basis): the steal-only load check must
    # also see the per-pass maximum
    qualifies, load_inflated = sitting_verdict(
        0.05, None, False, 0.03, max_pass_steal_pct=0.12
    )
    assert load_inflated is True
    assert qualifies is False


def test_max_pass_steal_alone_provides_load_evidence():
    # overall steal unreadable but per-pass readings exist: the sitting
    # still carries load evidence and is judged on it
    qualifies, load_inflated = sitting_verdict(
        0.05, None, False, None, max_pass_steal_pct=0.002
    )
    assert load_inflated is False
    assert qualifies is True


def test_omitting_max_pass_steal_preserves_r14_behavior():
    # existing four-arg call sites (artifacts, older tooling) must
    # judge exactly as before
    assert sitting_verdict(0.05, 1.0, True, 0.002) == (True, False)
    assert sitting_verdict(0.05, 1.0, True, 0.169) == (False, True)


def test_artifact_self_description_constants():
    # VERDICT r14 "what's wrong" #1: every artifact must carry the
    # canary basis it was judged against and the table era it belongs
    # to. The constants are the single source of truth bench.py emits.
    from bench import CANARY_BASELINE_SF01, TABLE_VERSION

    assert TABLE_VERSION == "r16"  # bump together with a re-base
    assert CANARY_BASELINE_SF01 == pytest.approx(0.09)


def test_bench_main_emits_canary_basis_and_table_version():
    # the emission wiring, not just the constants: main() builds the
    # artifact dict with canary_basis/table_version keys. Parse the
    # source rather than running a SparkSession.
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    assert '"canary_basis"' in src
    assert '"table_version"' in src


def test_bench_main_emits_cpus_and_sf_dir():
    # VERDICT r15 "what's wrong" #3: the canary-scope rule makes the
    # core count interpretation-critical, so the one-line JSON must
    # carry the measurement config itself — a reader must never infer
    # cpus or the data directory from the artifact's filename.
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    assert '"cpus": cpus' in src
    assert '"sf_dir": sf_dir' in src


# --- r15: sitting scorer (scripts/score_sitting.py) -----------------


def _load_scorer():
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "score_sitting", os.path.join(repo, "scripts", "score_sitting.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scorer_table_matches_baseline_md():
    # the embedded table must stay in sync with BASELINE.md's r15 table
    ss = _load_scorer()
    assert len(ss.JUDGING_TABLE) == 31
    assert ss.TABLE_TOTAL == pytest.approx(26.06, abs=0.06)  # doc says 26.1 (rounded)
    assert ss.JUDGING_TABLE["top_orders_by_value"] == pytest.approx(
        CANARY_BASELINE_SF01
    )  # canary basis moves with the table


def test_scorer_ratios_and_downward_trigger():
    ss = _load_scorer()
    # a sitting exactly at the table scores 1.0x, no trigger
    at_table = {"queries": dict(ss.JUDGING_TABLE), "canary_ratio": 1.0,
                "qualifies": True}
    s = ss.score(at_table)
    assert s["table_ratio"] == pytest.approx(1.0)
    assert s["over_1_3x"] == 0 and not s["downward_trigger"]
    # the r10-regime shape: ~0.75x total AND canary ~0.74 -> trigger
    fast = {"queries": {k: v * 0.74 for k, v in ss.JUDGING_TABLE.items()},
            "canary_ratio": 0.74, "qualifies": True}
    assert ss.score(fast)["downward_trigger"] is True
    # fast total but canary normal (one lucky row) -> NO trigger
    fast_no_canary = dict(fast, canary_ratio=1.0)
    assert ss.score(fast_no_canary)["downward_trigger"] is False


def test_scorer_handles_missing_queries():
    ss = _load_scorer()
    partial = {
        "queries": {"pricing_summary": ss.JUDGING_TABLE["pricing_summary"]},
        "canary_ratio": None,
    }
    s = ss.score(partial)
    assert s["table_ratio"] == pytest.approx(1.0)
    assert len(s["missing"]) == 30
    assert s["downward_trigger"] is False


def test_canary_scope_is_the_table_config():
    # r15 measurement-semantics fix: the canary basis is sf0.1 AT
    # local[32] (the judging table's config). The driver also benches
    # at lower core counts to measure scaling — there the canary
    # inflates with the narrower cluster, not with load, so those
    # sittings must be judged spread+steal only (canary fields null),
    # like a non-judged SF. Pin the constant and the main() wiring.
    import inspect

    import bench

    assert bench.CANARY_BASELINE_CPUS == 32
    src = inspect.getsource(bench.main)
    assert "cpus == CANARY_BASELINE_CPUS" in src

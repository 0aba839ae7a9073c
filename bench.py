"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced to full execution with a count-collapsing action
(``df.write.format("noop")`` — materializes every row, no sink cost).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_glue_redshift_datawarehouse_etl_pipeline_spark import queries as q
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.session import get_spark

# BASELINE.md's sitting-qualification rule ("a sitting qualifies ...
# only when its warm passes agree"): pass 1 carries whole-stage-codegen
# JIT, so agreement is judged on passes 2..n. Historical calibration:
# qualifying sittings read 2-7% warm spread, host-noise sittings 25%+
# (BENCH_r12 = 25%, disqualified by the judge at adjudication cost —
# VERDICT r12 ask #3 is this flag). 10% splits the two populations.
WARM_SPREAD_QUALIFY = 0.10


def warm_pass_spread(pass_totals: list[float]) -> float | None:
    """Relative spread (max-min)/min of the warm pass totals (all but
    the first). None when fewer than two warm totals exist — a 1- or
    2-pass sitting carries no agreement evidence."""
    warm = pass_totals[1:]
    if len(warm) < 2 or min(warm) <= 0:
        return None
    return (max(warm) - min(warm)) / min(warm)


BENCH_QUERIES = [
    # relational / star-schema core
    "pricing_summary",
    "star_revenue_by_nation",
    "antijoin_composite_lineitem",
    "merge_upsert_orders",
    "topk_customers_per_nation",
    "top_orders_by_value",
    # time-series joins (join-free asof, binned range)
    "asof_purchase_last_click",
    "range_join_error_context",
    # warehouse ops + event analytics
    "snapshot_diff_orders",
    "funnel_view_click_purchase",
    "retention_weekly_purchases",
    # training-data operator families
    "token_count_documents",
    "dedup_exact_documents",
    "minhash_lsh_dedup_documents",
    "minhash_lsh_dedup_transitive_fast",
    "stratified_sample_documents",
    "embedding_cosine_topk",
    # curation extensions (round 2)
    "embedding_near_dup_bucketed_pairs",
    "contamination_check_documents",
    "token_budget_per_source",
    "pack_sequences_documents",
    # streaming engine (availableNow over staged events)
    "streaming_hourly_event_counts",
    # physical-layout machinery (round 6): bucketed write + exchange-free
    # join (timing includes the one-off bucketed write both sides) and
    # codec-free image-header parse over synthesized binary payloads
    "cobucketed_join_revenue",
    "multimodal_image_dims",
    # transactional commit log (two commits + head/time-travel reads),
    # the Q5-shape 5-way join, and exact-substring (repeated-span)
    # dedup stats (round 6)
    "txlog_orders_time_travel",
    "local_supplier_volume_by_nation",
    "repeated_span_stats_documents",
    # decorrelated-subquery shapes (Q18/Q16): single fact scan + reused
    # per-order aggregate, broadcast anti-join supplier exclusion
    "large_order_customers",
    "parts_supplier_counts",
    # transactional DML throughput (4 banded appends + stats-pruned
    # DELETE + UPDATE) and embedding-space semantic dedup. The
    # stream-stream join query stays out: its wall-clock is micro-batch
    # framework overhead (two file streams + state store), which the
    # hourly-counts entry already represents for streaming.
    "txlog_dml_orders",
    "semantic_dedup_survivors",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    spark = get_spark(app_name="engine-bench", cpus=cpus, shuffle_partitions=cpus)
    q.register_all()
    names = [n for n in BENCH_QUERIES if n in q.QUERIES]
    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    try:
        q.QUERIES[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    # one broken query must not lose the other measurements: isolate
    # each run and record the error string instead of the timing.
    # median-of-3: single-run numbers produced a false-regression scare
    # in three consecutive rounds (a query reading 2.3x its own same-day
    # same-code median under ambient host contention). The whole query
    # loop runs three times; each query reports the median of its three
    # passes, which absorbs both the first-pass whole-stage-codegen JIT
    # cost and one-off contention spikes. The three per-pass totals are
    # reported alongside so a hot sitting is visible in the artifact.
    passes: list[dict[str, float]] = []
    errors: dict[str, list[str]] = {}
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    for pass_no in range(n_passes):
        pass_timings: dict[str, float] = {}
        for name in names:
            # errored queries are retried in later passes (a transient
            # pass-1 failure must not lose the query entirely); the
            # error record is dropped below if any pass succeeded.
            # storage hygiene between queries: several dedup/LSH queries
            # persist intermediates for their own multi-consumer stages and
            # (correctly) leave release to the caller's session lifecycle;
            # in this one-JVM multi-query loop those frames accumulate until
            # executor storage hits eviction pressure and a later query's
            # cache thrashes (measured: a 1.6 s warm query reading 10.7 s
            # mid-run at sf1, SCALE.md). Clearing between queries makes
            # each measurement pay exactly its own materializations.
            spark.catalog.clearCache()
            start = time.perf_counter()
            try:
                q.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                pass_timings[name] = time.perf_counter() - start
            except Exception as exc:  # noqa: BLE001 — bench must always emit JSON
                # keep EVERY pass's failure mode: a transient pass-1 OOM
                # followed by a real pass-2 bug must not lose the first
                # record (ADVICE r11)
                errors.setdefault(name, []).append(
                    f"pass {pass_no + 1}: {type(exc).__name__}: {exc}"[:500]
                )
        passes.append(pass_timings)
    timings = {
        name: round(statistics.median(samples), 4)
        for name in names
        if (samples := [p[name] for p in passes if name in p])
    }
    samples_per_query = {
        name: n
        for name in names
        if (n := sum(1 for p in passes if name in p))
    }
    # a query that succeeded in at least one pass is a measurement, not
    # an error — keep only queries that failed in EVERY pass in `errors`,
    # with all per-pass failure modes joined into one record
    errors = {
        k: " | ".join(v) for k, v in errors.items() if k not in timings
    }
    total = round(sum(timings.values()), 4)
    # sitting self-qualification (VERDICT r12 ask #3): spread is
    # computed over totals restricted to queries present in EVERY pass,
    # so a query that missed a pass can't skew the comparison; a
    # sitting whose warm passes disagree beyond the threshold is a
    # host-noise sitting by BASELINE.md's own rule and says so in the
    # artifact instead of leaving the judgment to the reader.
    common = [name for name in names if all(name in p for p in passes)]
    comparable_totals = [sum(p[n] for n in common) for p in passes]
    spread = warm_pass_spread(comparable_totals)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "stat": f"median_of_{n_passes}",
        "pass_totals": [
            round(sum(p.values()), 4) for p in passes
        ],
        "warm_spread": round(spread, 4) if spread is not None else None,
        "qualifies": spread is not None and spread <= WARM_SPREAD_QUALIFY,
    }
    # only surface per-query sample counts when a query missed a pass —
    # the common all-passes-succeeded case stays one compact JSON line.
    # pass_query_counts goes with them: when passes cover different
    # query subsets their totals aren't comparable as a hot-sitting
    # signal, and that must be visible in the JSON, not silent.
    if any(n < n_passes for n in samples_per_query.values()):
        out["samples_per_query"] = {
            k: v for k, v in samples_per_query.items() if v < n_passes
        }
        out["pass_query_counts"] = [len(p) for p in passes]
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

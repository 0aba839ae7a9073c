"""Committed single-thread host-regime instrument (VERDICT r15 ask #6).

BASELINE.md's re-base governance rule has an external-instrument arm
that historically cited a "20M-hash single-thread microbenchmark"
whose loop body was never committed, making its idle band
(1.6-2.1 s) irreproducible. This file IS the instrument from round 16
on: a fixed, dependency-free, single-thread CPU loop whose absolute
wall-clock tracks the host regime (hypervisor co-tenancy, shared
cache/memory-bandwidth pressure) independently of Spark, the JVM and
the query code. Because it is single-threaded and CPU-bound it is
also sensitive to the shared-resource inflation that does NOT
register as /proc/stat steal (BASELINE.md "residual caveat").

Instrument definition (NEVER change without bumping the version tag —
the recorded idle band belongs to this exact loop):

    md5 of a fixed 64-byte buffer, re-fed its own digest, 5,000,000
    iterations, single thread, pure stdlib.

Usage:
    python scripts/regime_probe.py [--reps 5]

Output: ONE JSON line with per-rep seconds, the median, and the
/proc/stat steal fraction across the whole probe, e.g.
    {"instrument": "md5-chain-v1", "iters": 5000000,
     "reps_sec": [...], "median_sec": ..., "steal_pct": ...}

The idle band for THIS host is recorded in BASELINE.md next to the
governance rule at calibration time; a reading inside the band
certifies the r10/r15-era regime, a uniformly shifted reading
quantifies the regime ratio directly (the loop has no memory
footprint to speak of, so a shift is CPU-share/frequency, not cache).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import read_proc_stat, steal_fraction

INSTRUMENT = "md5-chain-v1"
ITERS = 5_000_000
_SEED = b"spark-graft-regime-probe-seed-0123456789abcdef-0123456789abcdef"[:64]


def one_rep(iters: int = ITERS) -> float:
    """One timed rep of the fixed loop. The digest chains so the loop
    cannot be optimized away and every iteration does identical work."""
    buf = _SEED
    start = time.perf_counter()
    for _ in range(iters):
        buf = hashlib.md5(buf).digest()
    elapsed = time.perf_counter() - start
    # 16-byte digest: deterministic final value double-checks the loop
    # actually ran the committed work (not a truncated/optimized variant)
    assert len(buf) == 16
    return elapsed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()
    before = read_proc_stat()
    reps = [round(one_rep(args.iters), 4) for _ in range(args.reps)]
    steal = steal_fraction(before, read_proc_stat())
    srt = sorted(reps)
    median = srt[len(srt) // 2] if len(srt) % 2 else round(
        (srt[len(srt) // 2 - 1] + srt[len(srt) // 2]) / 2, 4
    )
    print(
        json.dumps(
            {
                "instrument": INSTRUMENT,
                "iters": args.iters,
                "reps_sec": reps,
                "median_sec": median,
                "steal_pct": round(steal, 4) if steal is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()

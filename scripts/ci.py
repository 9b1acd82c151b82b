"""CI gate: CPU test suite + TPU benchmark vs the last recorded round.

One command, red (exit 1) on any test failure or on a bench regression
beyond the documented noise rule (the tunneled chip shows ~2x
run-to-run clock variance; bench.py already takes best-of-batches, so
a >20% drop against the best previous round is treated as real —
CLAUDE.md "Measured perf landmarks").

Usage: python scripts/ci.py [--skip-tests] [--skip-bench]
Exit codes: 0 ok, 1 tests failed, 2 bench regression, 3 bench failed.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOISE_FRACTION = 0.20


def last_round_value() -> float | None:
    """Best 'value' across BENCH_r*.json and BENCH_LOCAL.json."""
    best = None
    for path in glob.glob(os.path.join(ROOT, "BENCH_r*.json")) + \
            glob.glob(os.path.join(ROOT, "BENCH_LOCAL.json")):
        try:
            rec = json.load(open(path))
            v = float(rec["value"])
            best = v if best is None else max(best, v)
        except Exception:
            continue
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tests", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    if not args.skip_tests:
        print("== CPU test suite ==", flush=True)
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q"],
            cwd=ROOT)
        if rc != 0:
            print("CI: TESTS FAILED")
            return 1
        # Kernel-guard sweep (VERDICT r4 #9): re-run the traversal
        # suites with HRT_KERNEL_GUARDS=1 so the device-fault class
        # (corrupted records / out-of-range indices) is caught as a
        # host error pre-commit.  The guard tests themselves verify
        # guards FIRE on corruption; this sweep verifies clean walks
        # stay silent with validators compiled in.
        print("== kernel guards sweep ==", flush=True)
        env = dict(os.environ, HRT_KERNEL_GUARDS="1")
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/test_wide8.py",
             "tests/test_tlas8.py", "tests/test_traversal_pallas.py",
             "-x", "-q"], cwd=ROOT, env=env)
        if rc != 0:
            print("CI: GUARD SWEEP FAILED")
            return 1

    if not args.skip_bench:
        print("== TPU benchmark ==", flush=True)
        out = subprocess.run([sys.executable, "bench.py"], cwd=ROOT,
                             capture_output=True, text=True)
        line = (out.stdout.strip().splitlines() or [""])[-1]
        try:
            rec = json.loads(line)
        except Exception:
            print(out.stdout)
            print(out.stderr[-2000:])
            print("CI: BENCH FAILED (no JSON line)")
            return 3
        print(line)
        prev = last_round_value()
        if prev is not None:
            floor = prev * (1.0 - NOISE_FRACTION)
            if rec["value"] < floor:
                print(f"CI: PERF REGRESSION — {rec['value']:.1f} < "
                      f"{floor:.1f} (best previous {prev:.1f} - "
                      f"{NOISE_FRACTION:.0%} noise)")
                return 2
            print(f"CI: perf ok ({rec['value']:.1f} vs previous best "
                  f"{prev:.1f})")
        # Record the local best for future gates.
        local = os.path.join(ROOT, "BENCH_LOCAL.json")
        old = None
        if os.path.exists(local):
            try:
                old = json.load(open(local))["value"]
            except Exception:
                pass
        if old is None or rec["value"] > old:
            json.dump(rec, open(local, "w"))

    print("CI: OK")
    return 0


if __name__ == "__main__":
    main_rc = main()
    sys.exit(main_rc)

"""Sharded pytest runner — the full suite in ~1/N the wall.

The suite crossed 44 minutes serial (VERDICT r13 #9).  Test files are
already session-isolated (one session-scoped SparkSession per pytest
process), so N pytest subprocesses over disjoint FILE sets are safe;
each worker gets local[32/N] so the box is not oversubscribed.

Balance: files are assigned longest-processing-time-first from the
durations ledger ``tools/test_durations.json`` when present (written by
this runner from pytest's --durations output, summed per file), else
from file size as a proxy.  Every run refreshes the ledger, so balance
improves after the first use.

Usage:
    python tools/run_tests_sharded.py [-n WORKERS] [pytest args...]

Exit code is nonzero iff any shard failed.  Per-shard tails print at
the end; full logs land under /tmp/pytest_shards/.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DURATIONS_PATH = os.path.join(REPO, "tools", "test_durations.json")
_DUR_RE = re.compile(r"^\s*([\d.]+)s\s+(?:call|setup|teardown)\s+(tests/[^:]+)::")


def _load_weights(files: list[str]) -> dict[str, float]:
    if os.path.isfile(DURATIONS_PATH):
        try:
            with open(DURATIONS_PATH) as fh:
                known = json.load(fh)
        except (OSError, json.JSONDecodeError):
            known = {}
        if known:
            median = sorted(known.values())[len(known) // 2]
            return {f: float(known.get(f, median)) for f in files}
    return {f: float(os.path.getsize(os.path.join(REPO, f))) for f in files}


def _assign(files: list[str], weights: dict[str, float], n: int):
    """Greedy LPT: heaviest file to the lightest shard."""
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in sorted(files, key=lambda f: -weights[f]):
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += weights[f]
    return [s for s in shards if s], loads


def _harvest_durations(log_paths: list[str]) -> dict[str, float]:
    per_file: dict[str, float] = {}
    for p in log_paths:
        try:
            with open(p) as fh:
                for line in fh:
                    m = _DUR_RE.match(line)
                    if m:
                        sec, f = float(m.group(1)), m.group(2)
                        per_file[f] = per_file.get(f, 0.0) + sec
        except OSError:
            pass
    return per_file


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int, default=4)
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args(argv)

    files = sorted(
        os.path.relpath(p, REPO)
        for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    weights = _load_weights(files)
    shards, loads = _assign(files, weights, args.workers)
    cpus_each = max(4, 32 // max(1, len(shards)))
    log_dir = "/tmp/pytest_shards"
    os.makedirs(log_dir, exist_ok=True)

    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        log = os.path.join(log_dir, f"shard{i}.log")
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus_each))
        cmd = [
            sys.executable, "-m", "pytest", "-q", "--durations=0",
            *args.pytest_args, *shard,
        ]
        procs.append(
            (i, log, subprocess.Popen(
                cmd, cwd=REPO, env=env,
                stdout=open(log, "w"), stderr=subprocess.STDOUT,
            ))
        )
        print(f"shard {i}: {len(shard)} files (est {loads[i]:.0f}) -> {log}")

    rc = 0
    for i, log, p in procs:
        code = p.wait()
        with open(log) as fh:
            tail = [ln.rstrip() for ln in fh if ln.strip()][-1:]
        print(f"shard {i}: exit {code} | {tail[0] if tail else '(no output)'}")
        rc = rc or code

    harvested = _harvest_durations([log for _, log, _ in procs])
    if harvested:
        try:
            with open(DURATIONS_PATH, "w") as fh:
                json.dump(dict(sorted(harvested.items())), fh, indent=1)
        except OSError:
            pass
    print(f"total wall: {time.time() - t0:.0f}s across {len(shards)} shards")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Per-query bench gate — the perf analogue of oracle_check.py.

Usage:
  bench_check.py <bench.json> [--factor 2.0] [--slack 0.3]
  bench_check.py --rebaseline <artifact.json> [<artifact.json> ...]

Gate mode compares each query's median in <bench.json> against
tools/baselines.json and FAILS (exit 1) on any query slower than
factor x baseline AND more than `slack` seconds over it (the absolute
guard keeps sub-second queries from flapping on +/- noise). Queries
with no recorded baseline are reported as new, never failed — record
them with --rebaseline once their first quiet-box capture lands.

Rebaseline mode writes tools/baselines.json as the per-query MIN of the
medians across the given artifacts — the best recorded quiet-box level,
the same anchor VERDICT's 2x gate uses. Only builder (quiet-box)
captures belong in the baseline set; driver-box captures are the thing
the gate screens, not the anchor (BASELINE.md session-noise notes).
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINES = os.path.join(HERE, "baselines.json")


def medians(path):
    with open(path) as f:
        data = json.load(f)
    qs = data.get("queries")
    if not isinstance(qs, dict) or not qs:
        raise SystemExit(f"{path}: no per-query medians found")
    return {k: float(v) for k, v in qs.items() if isinstance(v, (int, float)) and v >= 0}


def rebaseline(paths):
    base = {}
    for p in paths:
        for q, sec in medians(p).items():
            base[q] = min(base.get(q, sec), sec)
    with open(BASELINES, "w") as f:
        json.dump({"sources": [os.path.basename(p) for p in paths],
                   "baselines": dict(sorted(base.items()))}, f, indent=1)
    print(f"wrote {BASELINES}: {len(base)} queries from {len(paths)} artifacts")


def check(path, factor, slack):
    with open(BASELINES) as f:
        base = json.load(f)["baselines"]
    cur = medians(path)
    flagged, new = [], []
    for q, sec in sorted(cur.items()):
        b = base.get(q)
        if b is None:
            new.append(q)
        elif sec > factor * b and sec - b > slack:
            flagged.append((q, sec, b, sec / b))
    for q, sec, b, ratio in flagged:
        print(f"FAIL {q}: {sec:.3f}s vs baseline {b:.3f}s = {ratio:.2f}x "
              f"(gate {factor:.1f}x)")
    for q in new:
        print(f"  new {q}: {cur[q]:.3f}s (no baseline; --rebaseline to record)")
    ok = len(cur) - len(flagged) - len(new)
    print(f"{ok} within gate, {len(new)} new, {len(flagged)} over "
          f"{factor:.1f}x+{slack:.1f}s of {os.path.basename(BASELINES)}")
    if flagged:
        sys.exit(1)
    print("BENCH GATE PASS")


def main():
    args = sys.argv[1:]
    if not args:
        raise SystemExit(__doc__)
    if args[0] == "--rebaseline":
        if len(args) < 2:
            raise SystemExit("--rebaseline needs at least one artifact")
        rebaseline(args[1:])
        return
    factor, slack, path = 2.0, 0.3, args[0]
    rest = args[1:]
    while rest:
        if rest[0] == "--factor":
            factor, rest = float(rest[1]), rest[2:]
        elif rest[0] == "--slack":
            slack, rest = float(rest[1]), rest[2:]
        else:
            raise SystemExit(f"unknown arg {rest[0]}")
    check(path, factor, slack)


if __name__ == "__main__":
    main()

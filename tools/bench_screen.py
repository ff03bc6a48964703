#!/usr/bin/env python3
"""Mechanical 3x bench screen: compare two committed per-query bench maps.

Usage: python3 tools/bench_screen.py <prev.json> <cur.json> [factor=3.0]

Each input is a bench dump whose FIRST line is the full
{"metric":"total",...,"queries":{name:sec,...}} JSON (the layout Bench
writes to bench_out/BENCH_LAST.json and the round-end copy commits as
bench_out/BENCH_r<N>_full.json). Prints one line per entry whose
cur/prev wall ratio exceeds the factor (candidates for an isolated
SPARK_GRAFT_ONLY=<q> SPARK_GRAFT_REPEAT=3 SPARK_GRAFT_JOBSTATS=1
re-measure — wall clock alone NEVER proves a regression on this host),
plus entries present on only one side. Exit code 0 always: the screen
selects what to re-measure, it does not judge.
"""
import json
import sys


def load(path):
    """Accept either layout: a full per-query map as the FIRST line
    (bench_out/BENCH_LAST.json, committed BENCH_r<N>_full.json), or the
    driver's BENCH_r<N>.json whose `tail` field holds a tail-truncated
    capture of that line (the only recoverable per-query data for rounds
    that did not commit a full map). Truncated captures may cut mid-pair,
    so the tail path extracts well-formed "name":seconds pairs only."""
    import re
    with open(path) as f:
        first = f.readline()
    d = json.loads(first if first.lstrip().startswith("{") and
                   first.rstrip().endswith("}") else open(path).read())
    qs = d.get("queries", {})
    if not qs and isinstance(d.get("tail"), str):
        qs = {m.group(1): float(m.group(2)) for m in
              re.finditer(r'"([a-z0-9_#]+)":([0-9]+\.[0-9]+)', d["tail"])
              if m.group(1) not in ("value", "sf", "n", "rc", "cpus")}
        print(f"note: {path} carries no full map; recovered "
              f"{len(qs)} entries from its tail capture")
    return {k: v for k, v in qs.items() if isinstance(v, (int, float))}


def main():
    prev, cur = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    tripped = []
    for name, sec in sorted(cur.items()):
        if name not in prev:
            print(f"NEW      {name}: {sec:.2f}s (no previous measurement)")
            continue
        p = prev[name]
        if p > 0 and sec / p >= factor and sec - p > 0.5:
            tripped.append((sec / p, name, p, sec))
    for ratio, name, p, sec in sorted(tripped, reverse=True):
        print(f"TRIPPED  {name}: {p:.2f}s -> {sec:.2f}s ({ratio:.1f}x)")
    for name in sorted(set(prev) - set(cur)):
        print(f"GONE     {name}: was {prev[name]:.2f}s")
    print(f"screen: {len(tripped)} tripped / {len(cur)} entries "
          f"(factor {factor}, min delta 0.5s)")


if __name__ == "__main__":
    main()

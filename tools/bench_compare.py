#!/usr/bin/env python3
"""Compare two BENCH.json artifacts: per-query median deltas, sorted by
ratio, flagging queries outside a tolerance band. Usage:

    python3 tools/bench_compare.py BENCH_r08.json BENCH.json [tol]

Queries present in only one artifact are listed separately. `tol` is the
flag threshold as a ratio (default 1.2 = ±20%).
"""
import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    rows = []
    for q in common:
        va, vb = qa[q], qb[q]
        if va <= 0 or vb <= 0:
            continue
        rows.append((vb / va, q, va, vb))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > tol or r[0] < 1 / tol]
    print(f"{len(common)} common queries; sum {a_path}={sum(qa[q] for q in common):.1f}s "
          f"{b_path}={sum(qb[q] for q in common):.1f}s")
    print(f"\nflagged (ratio > {tol} or < {1/tol:.2f}): {len(flagged)}")
    for ratio, q, va, vb in flagged:
        print(f"  {ratio:6.2f}x  {q:32s} {va:8.2f}s -> {vb:8.2f}s")
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    if only_a:
        print(f"\nonly in {a_path}: {', '.join(only_a)}")
    if only_b:
        print(f"\nonly in {b_path}: {', '.join(only_b)}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Merge per-query ScaleBench artifacts (one JSON per solo run) into a
single SCALE_r{N}.json with the canonical {base, x1, x10, ...} shape.

Usage: python3 tools/merge_scale.py OUT.json IN1.json IN2.json ...

Solo per-query runs exist so one query's failure (or a contended box)
never invalidates the others' curves; the merge is a pure dict union —
it refuses to overwrite an existing (mult, query) cell.
"""
import json
import sys


def main() -> None:
    out_path, ins = sys.argv[1], sys.argv[2:]
    merged: dict = {}
    # explicit raises, not asserts: under `python -O` asserts vanish, and
    # the base write must not live inside a droppable expression
    for p in ins:
        j = json.load(open(p))
        for k, v in j.items():
            if k == "base":
                if "base" not in merged:
                    merged["base"] = v
                elif merged["base"] != v:
                    raise SystemExit(f"base mismatch in {p}: "
                                     f"{merged['base']!r} != {v!r}")
                continue
            cell = merged.setdefault(k, {})
            for q, m in v.items():
                if q in cell:
                    raise SystemExit(f"duplicate {k}/{q} from {p}")
                cell[q] = m
    if "base" not in merged:
        raise SystemExit("no input carried a 'base' key")
    json.dump(merged, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: " + ", ".join(
        f"{k}={len(v)}q" for k, v in merged.items() if k != "base"))


if __name__ == "__main__":
    main()

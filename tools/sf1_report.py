#!/usr/bin/env python3
"""Render BENCH_SF1.md's full-suite table from two graft.Bench JSON dumps.

Usage: python3 tools/sf1_report.py <sf0.1.json> <sfx1.json>
Prints a markdown table of every query's sf0.1 time, 10x time, and ratio,
sorted by ratio descending, plus totals. Queries that errored on either
side are listed separately.
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    qa, qb = a["queries"], b["queries"]
    rows = []
    bad = []
    for q in sorted(qa):
        ta, tb = qa.get(q, -1), qb.get(q, -1)
        if ta is None or tb is None or ta < 0 or tb < 0 or q not in qb:
            bad.append(q)
            continue
        rows.append((tb / ta if ta > 0 else float("inf"), q, ta, tb))
    rows.sort(reverse=True)
    print("| query | sf0.1 (s) | 10x (s) | ratio |")
    print("|---|---|---|---|")
    for r, q, ta, tb in rows:
        print(f"| {q} | {ta:.2f} | {tb:.2f} | {r:.1f}x |")
    ta = sum(t for _, _, t, _ in rows)
    tb = sum(t for _, _, _, t in rows)
    print(f"| **total ({len(rows)} queries)** | **{ta:.1f}** | **{tb:.1f}** "
          f"| **{tb / ta:.1f}x** |")
    if bad:
        print(f"\nerrored/missing on one side: {', '.join(bad)}")
    over = [q for r, q, _, _ in rows if r > 10]
    print(f"\nqueries over 10x: {over if over else 'NONE'}")


if __name__ == "__main__":
    main()

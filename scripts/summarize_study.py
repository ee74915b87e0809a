"""Render capability-study results.jsonl files into markdown tables.

Usage:
    python scripts/summarize_study.py runs/study_fullbudget/results.jsonl \
        [--modes partial uda iic udaiic] [--title "..."]

Prints a per-mode x per-seed table plus mean +- range, and the paired
per-seed comparisons against 'partial' (the reference's headline ordering
claim is ps < regularized, README.md:42-43).
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("results")
    ap.add_argument("--modes", nargs="*", default=None)
    ap.add_argument("--title", default=None)
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(args.results) if l.strip()]
    by = defaultdict(dict)  # mode -> seed -> dsc
    for r in rows:
        by[r["mode"]][r["seed"]] = r["best_val_dsc"]
    modes = args.modes or list(by)
    seeds = sorted({s for m in modes for s in by.get(m, {})})

    if args.title:
        print(f"## {args.title}\n")
    header = "| mode | " + " | ".join(f"seed {s}" for s in seeds) + " | mean ± range |"
    print(header)
    print("|" + "---|" * (len(seeds) + 2))
    for m in modes:
        vals = [by.get(m, {}).get(s) for s in seeds]
        cells = [f"{v:.4f}" if v is not None else "—" for v in vals]
        present = [v for v in vals if v is not None]
        if present:
            mean = sum(present) / len(present)
            stat = f"**{mean:.4f}** ({min(present):.4f}–{max(present):.4f})"
        else:
            stat = "—"
        print(f"| {m} | " + " | ".join(cells) + f" | {stat} |")

    if "partial" in by:
        print("\nPaired per-seed comparisons vs partial:")
        for m in modes:
            if m == "partial" or m not in by:
                continue
            wins = sum(
                1 for s in seeds
                if s in by[m] and s in by["partial"] and by[m][s] > by["partial"][s])
            total = sum(1 for s in seeds if s in by[m] and s in by["partial"])
            print(f"- {m} > partial on {wins}/{total} seeds")


if __name__ == "__main__":
    main()

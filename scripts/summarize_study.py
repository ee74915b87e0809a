"""Render capability-study results.jsonl files into markdown tables.

Usage:
    python scripts/summarize_study.py runs/study_fullbudget/results.jsonl \
        [--modes partial uda iic udaiic] [--title "..."] \
        [--filter fixture=v1 stem=conv]

Prints a per-mode x per-seed table plus mean +- range, and the paired
per-seed comparisons against 'partial' (the reference's headline ordering
claim is ps < regularized, README.md:42-43).

Rows are deduplicated by the FULL run key (mode, seed, fixture, stem,
geometry, precision) — the same key capability_study.py resumes on — so a
results file that mixes variants never silently overwrites across variants;
mixed-variant files print a warning and should be narrowed with --filter.
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict

# rows written before a variant axis existed carry its then-only value
VARIANT_DEFAULTS = {"fixture": "v1", "stem": "conv", "geometry": "fused",
                    "precision": "bfloat16"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("results")
    ap.add_argument("--modes", nargs="*", default=None)
    ap.add_argument("--title", default=None)
    ap.add_argument("--filter", nargs="*", default=[], metavar="KEY=VALUE",
                    help="variant filters, e.g. fixture=v2 precision=float32")
    args = ap.parse_args()

    filters = dict(kv.split("=", 1) for kv in args.filter)
    unknown = set(filters) - set(VARIANT_DEFAULTS)
    if unknown:
        ap.error(f"unknown --filter keys {sorted(unknown)}; "
                 f"valid: {sorted(VARIANT_DEFAULTS)}")

    def variant_of(r):
        return tuple(str(r.get(k, d)) for k, d in VARIANT_DEFAULTS.items())

    rows = [json.loads(l) for l in open(args.results) if l.strip()]
    rows = [r for r in rows
            if all(str(r.get(k, VARIANT_DEFAULTS[k])) == v
                   for k, v in filters.items())]
    dedup = {}
    for r in rows:  # full run key, last row wins (matches capability_study)
        dedup[(r["mode"], r["seed"], variant_of(r))] = r
    variants = {variant_of(r) for r in dedup.values()}
    if len(variants) > 1:
        names = tuple(VARIANT_DEFAULTS)
        print(f"WARNING: {len(variants)} variants mixed in this file "
              f"({names}): {sorted(variants)} — seed cells aggregate across "
              f"them; narrow with --filter.\n")
    by = defaultdict(dict)  # mode -> seed -> dsc
    for r in dedup.values():
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

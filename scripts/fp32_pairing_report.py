"""Assemble the 3-seed fp32-vs-bf16 full-budget pairing (VERDICT r4 item 4).

Merges the completed fp32 rows (r4 seed 20 + r5 seeds 10/30) with the r3
full-budget bf16 rows, writes docs/study_r05/results_fp32.jsonl (no
truncated rows) and prints the pairing table + README-ready guidance line.

Usage: python scripts/fp32_pairing_report.py
"""
from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SOURCES_FP32 = [
    REPO / "docs/study_r04/results_fp32.jsonl",   # seed 20 fp32 (+ bf16/bn32 probe)
    REPO / "runs/study_r05_fp32/results.jsonl",   # seeds 10, 30 fp32 (fresh)
]
BF16_FULLBUDGET = REPO / "docs/study_r03/results_fullbudget.jsonl"


def main():
    rows = {}
    for src in SOURCES_FP32:
        if not src.exists():
            continue
        for line in src.read_text().splitlines():
            r = json.loads(line)
            if r.get("precision") != "float32" or r.get("mode") != "udaiic":
                continue
            key = r["seed"]
            # fresh, complete rows replace truncated ones
            if key in rows and r.get("truncated"):
                continue
            if key not in rows or rows[key].get("truncated"):
                rows[key] = r
    bf16 = {}
    for line in BF16_FULLBUDGET.read_text().splitlines():
        r = json.loads(line)
        if r["mode"] == "udaiic":
            bf16[r["seed"]] = r["best_val_dsc"]

    out = REPO / "docs/study_r05/results_fp32.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        for seed in sorted(rows):
            f.write(json.dumps(rows[seed]) + "\n")

    print("| seed | bf16 best val DSC | fp32 best val DSC | Δ (fp32−bf16) |")
    print("|---|---|---|---|")
    deltas = []
    for seed in sorted(rows):
        fp = rows[seed]["best_val_dsc"]
        bf = bf16.get(seed)
        trunc = " (TRUNCATED)" if rows[seed].get("truncated") else ""
        d = fp - bf if bf is not None else float("nan")
        deltas.append(d)
        print(f"| {seed} | {bf:.4f} | {fp:.4f}{trunc} | {d:+.4f} |")
    import numpy as np

    print(f"\nmean Δ = {np.mean(deltas):+.4f} DSC over {len(deltas)} seeds; "
          f"fp32 > bf16 on {sum(d > 0 for d in deltas)}/{len(deltas)} seeds; "
          f"fp32 mean {np.mean([r['best_val_dsc'] for r in rows.values()]):.4f} "
          f"vs bf16 mean {np.mean([bf16[s] for s in rows]):.4f}")
    trunc_left = [s for s, r in rows.items() if r.get("truncated")]
    print(f"truncated rows remaining: {trunc_left or 'none'}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

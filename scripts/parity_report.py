"""Render the full-training-loop torch-parity study report.

Merges the per-epoch rows from scripts/torch_oracle.py (the REAL PyTorch
reference trainer) and scripts/jax_parity_run.py (this framework, CPU fp32,
identical fixture/split/budget/hyperparameters) into per-run overlay tables
plus a verdict summary, writing docs/study_r04/torch_parity_loop.md.

Usage:
    python scripts/parity_report.py [--torch runs/torch_oracle/results.jsonl]
        [--jax runs/jax_parity/results.jsonl] [--out docs/study_r04/torch_parity_loop.md]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load(path):
    runs = {}
    for line in Path(path).read_text().splitlines():
        r = json.loads(line)
        runs[(r["mode"], r["seed"])] = r
    return runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", default="runs/torch_oracle/results.jsonl")
    ap.add_argument("--jax", default="runs/jax_parity/results.jsonl")
    ap.add_argument("--out", default="docs/study_r04/torch_parity_loop.md")
    args = ap.parse_args()

    t_runs = load(args.torch)
    j_runs = load(args.jax)
    keys = sorted(set(t_runs) & set(j_runs))
    if not keys:
        raise SystemExit("no overlapping (mode, seed) runs yet")

    lines = [
        "# Full-training-loop parity: the actual torch reference vs this framework",
        "",
        "Setup: the REAL reference trainer (`/root/reference/semi_seg/trainer.py` +",
        "`epocher.py`, loaded at runtime by `scripts/torch_oracle.py` under",
        "dependency shims) and this framework (`scripts/jax_parity_run.py`,",
        "fp32, `Kernel.backend=xla` on CPU / `xla_scan` on TPU (identical",
        "per-displacement fp32 HIGHEST einsums; scan-serialized so the fp32",
        "backward fits the 16 GB chip), host data path; device noted per run —",
        "the 1-core host makes the heavier modes compile-bound under XLA:CPU,",
        "so those run on the TPU chip in fp32) trained on the IDENTICAL",
        "synthetic ACDC fixture",
        "(v1-hard, 40 train / 8 val patients, seed 0), identical patient split,",
        "budget and hyperparameters (Adam 1e-7 x400 warmup->cosine, batch 4+10,",
        "UDA mse w=10, IIC w=0.1, subheads 5, clusters 20, paddings [1,3]).",
        "Budget per run is stated in each section header (torch udaiic costs",
        "~38 s/step on this 1-core host, so udaiic runs use a reduced but",
        "identical-on-both-sides epochs x batches budget).",
        "Augmentation RNG streams necessarily differ (python/PIL vs keyed JAX),",
        "so the comparison standard is trajectory agreement within seed noise,",
        "not bit equality.",
        "",
    ]

    # split agreement
    t_pat = {tuple(r.get("labeled_patients", [])) for r in t_runs.values()}
    j_pat = {tuple(r.get("labeled_patients", [])) for r in j_runs.values()}
    lines.append(f"Labeled-patient split — torch: {sorted(t_pat)}; "
                 f"jax: {sorted(j_pat)}; "
                 f"{'IDENTICAL' if t_pat == j_pat else 'DIFFERENT (!)'}")
    lines.append("")

    carried = sorted({(m, s) for (m, s) in keys
                      if t_runs[(m, s)].get("carried_from")
                      or j_runs[(m, s)].get("carried_from")})
    if carried:
        lines += [f"Rows carried verbatim from an earlier committed run of this "
                  f"round (raw runs/ artifacts are cleaned between builder "
                  f"sessions): {', '.join(f'{m} s{s}' for m, s in carried)}.",
                  ""]

    lines.append("## Per-epoch trajectories (overlaid)")
    for mode, seed in keys:
        t, j = t_runs[(mode, seed)], j_runs[(mode, seed)]
        dev = j.get("device", "cpu")
        t_budget = f"{t.get('epochs', '?')}x{t.get('batches', '?')}"
        j_budget = f"{j.get('epochs', '?')}x{j.get('batches', '?')}"
        budget = (t_budget if t_budget == j_budget
                  else f"torch {t_budget} vs jax {j_budget} DIFFERENT (!)")
        jr = {r["epoch"]: r for r in j["rows"]}

        def _has_reg(rows):
            # NaN-safe presence check: missing key counts as no-reg (a row
            # without the key would otherwise give None == None -> True).
            return any("reg_loss" in r and r["reg_loss"] == r["reg_loss"]
                       for r in rows)

        with_reg = _has_reg(t["rows"]) and _has_reg(j["rows"])
        header = "| epoch | sup_loss torch | sup_loss jax "
        header += "| reg_loss torch | reg_loss jax " if with_reg else ""
        header += "| val_DSC torch | val_DSC jax |"
        lines += ["", f"### {mode}, seed {seed} ({budget}; torch: cpu; jax: {dev})", "",
                  header,
                  "|---|" + "---|" * (6 if with_reg else 4)]
        for r in t["rows"]:
            e = r["epoch"]
            if e not in jr:
                continue
            row = f"| {e} | {r['sup_loss']:.4f} | {jr[e]['sup_loss']:.4f} "
            if with_reg:
                row += f"| {r['reg_loss']:.4f} | {jr[e]['reg_loss']:.4f} "
            row += f"| {r['val_dsc']:.4f} | {jr[e]['val_dsc']:.4f} |"
            lines.append(row)

    lines += ["", "## Summary", "",
              "| mode | seed | best val DSC torch | best val DSC jax | Δ (jax−torch) |",
              "|---|---|---|---|---|"]
    deltas = []
    for mode, seed in keys:
        bt = t_runs[(mode, seed)]["best_val_dsc"]
        bj = j_runs[(mode, seed)]["best_val_dsc"]
        deltas.append(bj - bt)
        lines.append(f"| {mode} | {seed} | {bt:.4f} | {bj:.4f} | {bj - bt:+.4f} |")

    # seed-noise yardstick: spread of the torch runs across seeds per mode
    by_mode = {}
    for (mode, seed), r in t_runs.items():
        by_mode.setdefault(mode, []).append(r["best_val_dsc"])
    spreads = {m: (max(v) - min(v)) for m, v in by_mode.items() if len(v) > 1}
    lines += ["",
              f"Mean Δ(jax−torch) best val DSC: "
              f"{sum(deltas) / len(deltas):+.4f}; per-run |Δ| max: "
              f"{max(abs(d) for d in deltas):.4f}.",
              f"Torch cross-seed spread per mode (the seed-noise yardstick): "
              + ", ".join(f"{m}: {s:.4f}" for m, s in spreads.items()) + ".",
              ]
    out = REPO / args.out
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")
    print("\n".join(lines[-4:]))


if __name__ == "__main__":
    main()

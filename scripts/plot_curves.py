"""Training-curve plots from storage.csv — the analog of the reference's
offline csv drawers (WHEEL::deepclustering2/writer/DrawCSV2 etc.).

Usage:
    python scripts/plot_curves.py runs/exp1 [runs/exp2 ...] [--out curves.png]
            [--keys val_dice_DSC_mean tra_sup_loss_mean]

One subplot per key; one line per run directory. Headless (Agg backend).
"""
from __future__ import annotations

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--out", default="curves.png")
    ap.add_argument("--keys", nargs="*",
                    default=["val_dice_DSC_mean", "tra_sup_loss_mean",
                             "tra_reg_loss_mean", "test_dice_DSC_mean"])
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    frames = {}
    for d in args.run_dirs:
        csv = Path(d) / "storage.csv"
        if not csv.exists():
            print(f"skip {d}: no storage.csv")
            continue
        frames[Path(d).name] = pd.read_csv(csv)
    if not frames:
        raise SystemExit("no storage.csv found in any run dir")

    keys = [k for k in args.keys
            if any(k in df.columns for df in frames.values())]
    fig, axes = plt.subplots(1, max(len(keys), 1),
                             figsize=(5 * max(len(keys), 1), 4), squeeze=False)
    for ax, key in zip(axes[0], keys):
        for name, df in frames.items():
            if key in df.columns:
                ax.plot(df["epoch"], df[key], label=name)
        ax.set_title(key)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({len(keys)} panels, {len(frames)} runs)")


if __name__ == "__main__":
    main()

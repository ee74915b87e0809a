"""Experiment report aggregator — the analog of the reference's offline
``report2.py`` (WHEEL::deepclustering2/postprocessing): walks run
directories, pulls each run's best/final metrics out of storage.csv, and
prints a sorted comparison table (markdown or csv).

Usage:
    python scripts/report.py runs/ [--metric val_dice_DSC_mean] [--csv]
"""
from __future__ import annotations

import argparse
from pathlib import Path


def collect(root: Path, metric: str):
    import pandas as pd

    rows = []
    for csv in sorted(root.glob("**/storage.csv")):
        try:
            df = pd.read_csv(csv)
        except Exception:
            continue
        if metric not in df.columns or not len(df):
            continue
        best_i = df[metric].idxmax()
        rows.append({
            "run": str(csv.parent.relative_to(root)),
            "epochs": int(df["epoch"].max()) + 1,
            f"best_{metric}": float(df[metric].max()),
            "best_epoch": int(df.loc[best_i, "epoch"]),
            f"final_{metric}": float(df[metric].iloc[-1]),
        })
    return sorted(rows, key=lambda r: -r[f"best_{metric}"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default="runs")
    ap.add_argument("--metric", default="val_dice_DSC_mean")
    ap.add_argument("--csv", action="store_true")
    args = ap.parse_args()

    rows = collect(Path(args.root), args.metric)
    if not rows:
        raise SystemExit(f"no storage.csv with column {args.metric!r} under {args.root}")
    cols = list(rows[0].keys())
    if args.csv:
        print(",".join(cols))
        for r in rows:
            print(",".join(str(r[c]) for c in cols))
        return
    widths = {c: max(len(c), *(len(f"{r[c]:.4f}" if isinstance(r[c], float) else str(r[c]))
                               for r in rows)) for c in cols}
    print(" | ".join(c.ljust(widths[c]) for c in cols))
    print("-|-".join("-" * widths[c] for c in cols))
    for r in rows:
        print(" | ".join(
            (f"{r[c]:.4f}" if isinstance(r[c], float) else str(r[c])).ljust(widths[c])
            for c in cols))


if __name__ == "__main__":
    main()

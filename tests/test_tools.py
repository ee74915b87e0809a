"""Offline tooling: curve plotter + report aggregator (parity with the
reference's csv drawers / report2 aggregation, WHEEL::deepclustering2)."""

import subprocess
import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent


def _fake_run(root: Path, name: str, best: float):
    d = root / name
    d.mkdir(parents=True)
    pd.DataFrame({
        "epoch": [0, 1, 2],
        "val_dice_DSC_mean": [0.1, best, best - 0.05],
        "tra_sup_loss_mean": [1.0, 0.5, 0.4],
    }).to_csv(d / "storage.csv", index=False)
    return d


def test_report_aggregates_and_sorts(tmp_path):
    _fake_run(tmp_path, "a", 0.5)
    _fake_run(tmp_path, "b", 0.8)
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "report.py"), str(tmp_path)],
        capture_output=True, text=True, check=True).stdout
    lines = [l for l in out.splitlines() if l.startswith(("a", "b"))]
    assert lines[0].startswith("b") and "0.8000" in lines[0]
    assert lines[1].startswith("a")
    csv_out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "report.py"), str(tmp_path), "--csv"],
        capture_output=True, text=True, check=True).stdout
    assert csv_out.splitlines()[0].startswith("run,epochs,best_")


def test_plot_curves_writes_png(tmp_path):
    d = _fake_run(tmp_path, "a", 0.5)
    out = tmp_path / "c.png"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "plot_curves.py"), str(d),
         "--out", str(out)], capture_output=True, text=True, check=True)
    assert out.exists() and out.stat().st_size > 1000

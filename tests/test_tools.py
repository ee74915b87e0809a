"""Offline tooling: curve plotter + report aggregator (parity with the
reference's csv drawers / report2 aggregation, WHEEL::deepclustering2)."""

import json
import os
import subprocess
import numpy as np
import sys
from pathlib import Path

import pandas as pd
import pytest

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


def _write_nifti(path: Path, vol, gz=False):
    """Hand-rolled NIfTI-1 writer for testing the pure-numpy reader."""
    import gzip

    import numpy as np

    hdr = bytearray(352)
    hdr[0:4] = np.int32(348).tobytes()
    dim = np.zeros(8, np.int16)
    dim[0] = vol.ndim
    dim[1:1 + vol.ndim] = vol.shape
    hdr[40:56] = dim.tobytes()
    hdr[70:72] = np.int16(16).tobytes()  # float32
    hdr[72:74] = np.int16(32).tobytes()
    hdr[108:112] = np.float32(352).tobytes()
    hdr[112:116] = np.float32(1.0).tobytes()
    hdr[116:120] = np.float32(0.0).tobytes()
    hdr[344:348] = b"n+1\x00"
    blob = bytes(hdr) + np.asfortranarray(vol.astype(np.float32)).tobytes(order="F")
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(blob)
    else:
        path.write_bytes(blob)


def test_pure_numpy_nifti_reader(tmp_path):
    import numpy as np

    sys.path.insert(0, str(REPO / "scripts"))
    from preprocess_acdc import _load_nifti_numpy

    vol = np.random.default_rng(0).random((7, 9, 5)).astype(np.float32)
    p = tmp_path / "v.nii"
    _write_nifti(p, vol)
    np.testing.assert_array_equal(_load_nifti_numpy(p), vol)
    pgz = tmp_path / "v.nii.gz"
    _write_nifti(pgz, vol, gz=True)
    np.testing.assert_array_equal(_load_nifti_numpy(pgz), vol)


def test_plot_curves_writes_png(tmp_path):
    d = _fake_run(tmp_path, "a", 0.5)
    out = tmp_path / "c.png"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "plot_curves.py"), str(d),
         "--out", str(out)], capture_output=True, text=True, check=True)
    assert out.exists() and out.stat().st_size > 1000


# --- round 3: JobSubmiter + headless viewer (closes the r2 partial) ---------

def test_job_submiter_script_and_local_run(tmp_path):
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils.cluster import (
        JobSubmiter,
        sbatch_script_prefix,
    )

    prefix = sbatch_script_prefix("acct", time=3, job_name="j", mem=8,
                                  mail_user="x@y.z")
    assert "#SBATCH --time=0-3:00" in prefix
    assert "#SBATCH --mem=8000M" in prefix
    assert "#SBATCH --mail-user=x@y.z" in prefix

    marker = tmp_path / "ran.txt"
    sub = JobSubmiter(project_path=str(tmp_path), on_local=True,
                      account="acct", prepare_env=["export FOO=1"])
    script = sub.script_for("echo $FOO > ran.txt")
    assert "export FOO=1" in script and f"cd {tmp_path}" in script
    assert sub.run("echo $FOO > ran.txt") == 0
    assert marker.read_text().strip() == "1"


def test_viewer_mosaic_and_folder(tmp_path):
    from PIL import Image

    from mi_based_regularized_semi_supervised_segmentation_tpu.utils.viewer import (
        group_slices,
        render_folder,
        save_volume_mosaic,
        zero_transparent_cmap,
    )

    cmap = zero_transparent_cmap()
    assert cmap(0)[-1] == 0.0  # zero bin transparent
    assert cmap(cmap.N - 1)[-1] == 1.0

    rng = np.random.default_rng(0)
    vol = rng.random((7, 16, 16))
    mask = (vol > 0.7).astype(np.uint8)
    out = save_volume_mosaic(vol, [mask], out_path=str(tmp_path / "m.png"))
    assert (tmp_path / "m.png").exists()

    img_dir = tmp_path / "img"
    gt_dir = tmp_path / "gt"
    img_dir.mkdir(); gt_dir.mkdir()
    for pid in (1, 2):
        for s in range(3):
            stem = f"patient{pid:03d}_01_{s:02d}.png"
            Image.fromarray((vol[s] * 255).astype(np.uint8)).save(img_dir / stem)
            Image.fromarray(mask[s]).save(gt_dir / stem)
    groups = group_slices(str(img_dir))
    assert set(groups) == {"patient001_01", "patient002_01"}
    outs = render_folder(str(img_dir), [str(gt_dir)], out_dir=str(tmp_path / "v"))
    assert len(outs) == 2 and all(Path(p).exists() for p in outs)


def test_perf_table_generator(tmp_path):
    """scripts/perf_table.py renders the bench record (pretty-printed
    artifact wrapper and raw-JSON-line forms) as the README metrics table."""
    import json

    wrapped = {"parsed": {
        "metric": "slices_per_sec_per_chip", "value": 300.0, "unit": "slices/s",
        "vs_baseline": 4.41, "baseline": {"value": 68.0, "estimated": True},
        "e2e": {"value": 290.0, "vs_baseline": 4.26},
        "fp32": {"value": 200.0, "vs_baseline": 2.94}}}
    art = tmp_path / "BENCH_rXX.json"
    art.write_text(json.dumps(wrapped, indent=2))
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "perf_table.py"),
         "--bench", str(art)],
        capture_output=True, text=True, check=True).stdout
    assert "| bare udaiic step, bf16 (headline) | **300.0** | **4.41x** |" in out
    assert "| end-to-end training pipeline | 290.0 | 4.26x |" in out
    assert "estimated" in out

    log = tmp_path / "bench.log"
    log.write_text("warning: noise\n" + json.dumps(wrapped["parsed"]) + "\n")
    out2 = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "perf_table.py"),
         "--bench", str(log)],
        capture_output=True, text=True, check=True).stdout
    assert "**300.0**" in out2


@pytest.mark.slow
def test_capability_study_variant_resume(tmp_path):
    """Resume keys include the variant axes: a re-run with the same
    (mode, seed, fixture, stem, geometry) skips; changing the variant
    against the same --out re-runs instead of silently skipping, and every
    row records its variant (round-3 review finding)."""
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "STUDY_DATA": str(tmp_path / "data"),
    }
    base = [sys.executable, str(REPO / "scripts" / "capability_study.py"),
            "--out", str(tmp_path / "out"), "--quick",
            "--modes", "partial", "--seeds", "10"]

    first = subprocess.run(base, capture_output=True, text=True, env=env,
                           check=True, timeout=900).stdout
    assert "DONE partial seed 10" in first

    again = subprocess.run(base, capture_output=True, text=True, env=env,
                           check=True, timeout=900).stdout
    assert "skip partial seed 10 (done)" in again
    assert "DONE" not in again

    variant = subprocess.run(base + ["--geometry", "sequential"],
                             capture_output=True, text=True, env=env,
                             check=True, timeout=900).stdout
    assert "DONE partial seed 10" in variant

    rows = [json.loads(l) for l in
            (tmp_path / "out" / "results.jsonl").read_text().splitlines()]
    assert [r["geometry"] for r in rows] == ["fused", "sequential"]
    assert all(r["fixture"] == "v1" and r["stem"] == "conv" for r in rows)

#!/usr/bin/env python
"""Preprocess the raw ACDC challenge dataset into the on-disk format this
framework (and the reference) consumes.

The reference downloaded a preprocessed zip from a private Google Drive link
(/root/reference/contrastyou/dataloader/acdc_dataset.py:15-17); this script is
the reproducible recipe: raw ACDC nifti volumes ->
<out>/ACDC_contrast/{train,val}/{img,gt}/patientXXX_YY_ZZ.png + acdc_info.npy.

Usage:
    python scripts/preprocess_acdc.py --raw /path/to/ACDC/training \
        --out /path/to/data --val-patients 40

Per-slice processing: intensity clip to [p1, p99] of the volume, min-max
normalize to [0, 255] uint8; ground-truth label maps saved as-is
(0=bg, 1=RV, 2=myo, 3=LV). Filenames: patient{id:03d}_{frame:02d}_{slice:02d}.
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

import numpy as np


_NIFTI_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32,
}


def _load_nifti_numpy(path: Path) -> np.ndarray:
    """Minimal pure-numpy NIfTI-1 reader (.nii / .nii.gz): 348-byte header
    (dim at +40, datatype at +70, vox_offset at +108, scl at +112/+116,
    magic at +344), Fortran-ordered voxel block. Enough for ACDC volumes —
    no external nifti dependency needed."""
    import gzip

    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        raw = f.read()
    hdr = raw[:348]
    sizeof = np.frombuffer(hdr, "<i4", count=1, offset=0)[0]
    byteorder = "<" if sizeof == 348 else ">"
    dim = np.frombuffer(hdr, f"{byteorder}i2", count=8, offset=40)
    datatype = int(np.frombuffer(hdr, f"{byteorder}i2", count=1, offset=70)[0])
    vox_offset = int(np.frombuffer(hdr, f"{byteorder}f4", count=1, offset=108)[0])
    scl_slope = float(np.frombuffer(hdr, f"{byteorder}f4", count=1, offset=112)[0])
    scl_inter = float(np.frombuffer(hdr, f"{byteorder}f4", count=1, offset=116)[0])
    magic = hdr[344:348]
    assert magic[:3] in (b"n+1", b"ni1"), f"not a NIfTI-1 file: {path}"
    ndim = int(dim[0])
    shape = tuple(int(d) for d in dim[1:1 + ndim])
    dt = np.dtype(_NIFTI_DTYPES[datatype]).newbyteorder(byteorder)
    n = int(np.prod(shape))
    data = np.frombuffer(raw, dt, count=n, offset=vox_offset or 352)
    vol = data.reshape(shape, order="F")
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        vol = vol * (scl_slope or 1.0) + scl_inter
    return np.ascontiguousarray(vol)


def load_nifti(path: Path):
    try:
        import nibabel as nib  # preferred when available

        return np.asanyarray(nib.load(str(path)).dataobj)
    except ImportError:
        return _load_nifti_numpy(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", required=True, help="raw ACDC training dir (patientXXX/ subdirs)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--val-patients", type=int, default=40,
                    help="number of patients held out as the val (test) split")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    raw = Path(args.raw)
    patients = sorted(p for p in raw.iterdir() if p.is_dir() and p.name.startswith("patient"))
    assert patients, f"no patient dirs under {raw}"
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(patients))
    val_ids = {patients[i].name for i in order[: args.val_patients]}

    base = Path(args.out) / "ACDC_contrast"
    acdc_info = {}
    for patient_dir in patients:
        mode = "val" if patient_dir.name in val_ids else "train"
        for sub in ("img", "gt"):
            (base / mode / sub).mkdir(parents=True, exist_ok=True)
        frames = sorted(
            f for f in patient_dir.glob(f"{patient_dir.name}_frame*.nii.gz")
            if "_gt" not in f.name
        )
        pid = int(re.findall(r"\d+", patient_dir.name)[0])
        for frame_path in frames:
            frame = int(re.findall(r"frame(\d+)", frame_path.name)[0])
            gt_path = frame_path.with_name(frame_path.name.replace(".nii.gz", "_gt.nii.gz"))
            if not gt_path.exists():
                continue
            vol = load_nifti(frame_path).astype(np.float32)
            gt = load_nifti(gt_path).astype(np.uint8)
            lo, hi = np.percentile(vol, [1, 99])
            vol = np.clip(vol, lo, hi)
            vol = (vol - vol.min()) / max(vol.max() - vol.min(), 1e-6)
            group = f"patient{pid:03d}_{frame:02d}"
            n_slices = vol.shape[2]
            acdc_info[group] = n_slices
            for s in range(n_slices):
                stem = f"{group}_{s:02d}"
                img8 = (vol[:, :, s] * 255).astype(np.uint8)
                Image.fromarray(img8, mode="L").save(base / mode / "img" / f"{stem}.png")
                Image.fromarray(gt[:, :, s], mode="L").save(base / mode / "gt" / f"{stem}.png")
    np.save(str(base / "acdc_info.npy"), acdc_info, allow_pickle=True)
    print(f"wrote {len(acdc_info)} patient-frames under {base}")


if __name__ == "__main__":
    main()

"""Synthetic ACDC-format fixture generator.

The reference's preprocessed ACDC zip lives behind a private Google Drive link
(acdc_dataset.py:15-17), so CI/tests/bench need a stand-in with the exact
on-disk format: <root>/ACDC_contrast/{train,val}/{img,gt}/patientXXX_YY_ZZ.png
plus acdc_info.npy mapping patient -> slice count. Images are structured
(concentric ring "ventricle" phantoms) so segmentation training actually has
signal, not pure noise.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict

import numpy as np


def _patient_style(rng: np.random.Generator, hard: bool, v3: bool = False):
    """Per-patient appearance: intensity levels, scale, elliptic deformation,
    noise. In ``hard`` mode styles vary widely across patients, so a model
    trained on 2 labeled patients must generalize — the regime where the
    unlabeled regularizers matter.

    ``v3`` (VERDICT r4 item 9 — headroom fixture): class intensity OFFSETS
    are drawn from one shared near-zero range, so the per-patient intensity
    ORDERING of ring/cavity/RV vs background is effectively random — a model
    trained on 2 labeled patients cannot learn a transferable intensity->
    class mapping. The v2 fine texture (fixed-amplitude radial fibers /
    speckle / mottle, class-diagnostic across ALL patients) stays the one
    reliable cue, i.e. exactly the kind of augmentation-stable,
    patient-invariant feature the MI/consistency regularizers reward."""
    if v3:
        return dict(
            bg=rng.uniform(0.30, 0.50),
            ring=rng.uniform(-0.10, 0.16),
            cavity=rng.uniform(-0.10, 0.16),
            rv=rng.uniform(-0.10, 0.16),
            noise=rng.uniform(0.04, 0.09),
            r_scale=rng.uniform(0.7, 1.3),
            ecc=rng.uniform(0.75, 1.3),
            rot=rng.uniform(0, np.pi),
            texture=rng.uniform(0.0, 0.10),
        )
    if not hard:
        return dict(bg=0.25, ring=0.2, cavity=0.5, rv=0.25, noise=0.03,
                    r_scale=1.0, ecc=1.0, rot=0.0, texture=0.0)
    return dict(
        bg=rng.uniform(0.10, 0.45),
        ring=rng.uniform(0.10, 0.35),
        cavity=rng.uniform(0.25, 0.65),
        rv=rng.uniform(0.12, 0.40),
        noise=rng.uniform(0.02, 0.08),
        r_scale=rng.uniform(0.7, 1.3),
        ecc=rng.uniform(0.75, 1.3),
        rot=rng.uniform(0, np.pi),
        texture=rng.uniform(0.0, 0.15),
    )


def _phantom(rng: np.random.Generator, size: int, num_classes: int, style=None,
             v2: bool = False, v3: bool = False):
    """A ring phantom: background, myocardium ring, LV cavity, RV blob.

    v2 adds CROSS-SCALE anatomical structure (VERDICT r2 item 5 — the v1
    random phantoms gave the local-MI term nothing to exploit):
    - class-diagnostic fine texture, consistent across patients while the
      coarse intensity levels vary: radial fiber banding in the myocardium
      ring, isotropic speckle in the cavity, smooth low-frequency mottle in
      the RV — so FINE-scale features predict class identity even when
      intensities are ambiguous;
    - multi-scale boundary detail: the ring radius is modulated by angular
      harmonics (k = 3, 5, 8) with per-slice phases, so boundary shape has
      structure at several spatial scales.

    v3 implies the v2 texture (it IS the reliable cue there) — see
    _patient_style for the v3 intensity-ambiguity design."""
    v2 = v2 or v3
    style = style or _patient_style(rng, hard=False)
    yy, xx = np.indices((size, size))
    cy = size / 2 + rng.uniform(-size / 8, size / 8)
    cx = size / 2 + rng.uniform(-size / 8, size / 8)
    # eccentric, rotated radius metric (per-patient deformation)
    dy, dx = yy - cy, xx - cx
    c, s = np.cos(style["rot"]), np.sin(style["rot"])
    u = c * dx - s * dy
    v = (s * dx + c * dy) * style["ecc"]
    r = np.hypot(u, v)
    r_out = rng.uniform(size / 7, size / 4.8) * style["r_scale"]
    r_in = r_out * rng.uniform(0.5, 0.7)
    if v2:
        # wavy boundaries: radius modulated by angular harmonics
        theta = np.arctan2(v, u)
        wobble = np.zeros_like(r)
        for k in (3, 5, 8):
            wobble += rng.uniform(0.02, 0.06) * np.cos(
                k * theta + rng.uniform(0, 2 * np.pi))
        r_out_map = r_out * (1.0 + wobble)
        r_in_map = r_in * (1.0 + 0.6 * wobble)
    else:
        r_out_map, r_in_map = r_out, r_in
    gt = np.zeros((size, size), np.uint8)
    img = rng.normal(style["bg"], 0.05, (size, size))
    if style["texture"]:
        # low-frequency per-patient texture field
        coarse = rng.normal(0, style["texture"], (8, 8))
        img += np.kron(coarse, np.ones((size // 8, size // 8)))
    if num_classes >= 4:
        # RV: crescent next to the ring
        rv_cx = cx - r_out * 1.5
        rv = np.hypot(yy - cy, xx - rv_cx) < r_out * rng.uniform(0.7, 0.9)
        gt[rv] = 1
        img[rv] += style["rv"]
        if v2:
            # RV: smooth medium-scale mottle (16-px grain)
            g = size // 16
            mottle = np.kron(rng.normal(0, 0.06, (g, g)),
                             np.ones((size // g, size // g)))
            img[rv] += mottle[rv]
    ring = (r <= r_out_map) & (r > r_in_map)
    cavity = r <= r_in_map
    gt[ring] = 2 if num_classes >= 4 else 1
    gt[cavity] = 3 if num_classes >= 4 else 1
    img[ring] += style["ring"]
    img[cavity] += style["cavity"]
    if v2:
        # myocardium: fine radial fiber banding (period ~4 px along r)
        fibers = 0.07 * np.cos(2 * np.pi * r / rng.uniform(3.5, 4.5)
                               + rng.uniform(0, 2 * np.pi))
        img[ring] += fibers[ring]
        # cavity: fine isotropic speckle (1-px grain, class-diagnostic)
        speckle = rng.normal(0, 0.09, (size, size))
        img[cavity] += speckle[cavity]
    img = np.clip(img + rng.normal(0, style["noise"], img.shape), 0, 1)
    return (img * 255).astype(np.uint8), gt


def generate_synthetic_acdc(
    root: str,
    num_train_patients: int = 10,
    num_val_patients: int = 4,
    slices_per_patient: int = 10,
    size: int = 256,
    num_classes: int = 4,
    seed: int = 0,
    hard: bool = False,
    v2: bool = False,
    v3: bool = False,
) -> str:
    """Writes the dataset; returns ``root``. Idempotent (skips if present).
    ``v2`` adds cross-scale class-diagnostic texture (see _phantom); ``v3``
    additionally randomizes the per-patient class-intensity ordering so only
    the texture cue transfers across patients (headroom fixture)."""
    from PIL import Image

    base = Path(root) / "ACDC_contrast"
    info_path = base / "acdc_info.npy"
    if info_path.exists():
        return root
    rng = np.random.default_rng(seed)
    acdc_info: Dict[str, int] = {}
    patient_id = 0
    for mode, n_patients in (("train", num_train_patients), ("val", num_val_patients)):
        for sub in ("img", "gt"):
            (base / mode / sub).mkdir(parents=True, exist_ok=True)
        for _ in range(n_patients):
            patient_id += 1
            frame = 1
            group = f"patient{patient_id:03d}_{frame:02d}"
            acdc_info[group] = slices_per_patient
            style = _patient_style(rng, hard, v3=v3)
            for s in range(slices_per_patient):
                img, gt = _phantom(rng, size, num_classes, style, v2=v2, v3=v3)
                stem = f"{group}_{s:02d}"
                Image.fromarray(img, mode="L").save(base / mode / "img" / f"{stem}.png")
                Image.fromarray(gt, mode="L").save(base / mode / "gt" / f"{stem}.png")
    np.save(str(info_path), acdc_info, allow_pickle=True)
    return root

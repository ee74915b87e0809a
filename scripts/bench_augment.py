"""Microbenchmark the on-device augmentation components (TPU).

Times the fused augment (labeled pair + unlabeled) standalone, isolating the
element-gather cost that separates the bare step from the e2e pipeline
(docs/ROADMAP.md). Variants:

  - unpacked: two-gather labeled pair (uint8 img + uint8 label)
  - packed:   ONE uint16 img|label gather (DeviceDataStore pack=True)

Each timing runs the augmentation N times chained through a scalar readback
(block_until_ready does not synchronize on the tunneled axon platform).

Usage: python scripts/bench_augment.py [--steps 50]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_LAB, N_UNLAB, CANVAS, CROP = 4, 10, 256, 224


def time_fn(fn, args, steps):
    import jax

    out = fn(0, *args)
    float(jax.device_get(out))
    t0 = time.perf_counter()
    acc = 0
    for i in range(steps):
        out = fn(i, *args)
    acc = float(jax.device_get(out))
    del acc
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mi_based_regularized_semi_supervised_segmentation_tpu.ops.augment_device import (
        augment_pair_batch,
    )

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    n_store = 200
    imgs = rng.integers(0, 256, (n_store, CANVAS, CANVAS)).astype(np.uint8)
    labs = rng.integers(0, 4, (n_store, CANVAS, CANVAS)).astype(np.uint8)
    packed = (imgs.astype(np.uint16) << 8) | labs
    valid = np.tile(np.array([[CANVAS, CANVAS]], np.int32), (n_store, 1))
    offs = np.zeros((n_store, 2), np.int32)
    d_img = jax.device_put(imgs)
    d_lab = jax.device_put(labs)
    d_pk = jax.device_put(packed)
    d_valid = jax.device_put(valid)
    d_offs = jax.device_put(offs)
    lab_idx = jax.device_put(rng.integers(0, n_store, N_LAB).astype(np.int32))
    unlab_idx = jax.device_put(rng.integers(0, n_store, N_UNLAB).astype(np.int32))

    def checksum(img, lab):
        s = jnp.sum(img)
        if lab is not None:
            s = s + jnp.sum(lab).astype(jnp.float32)
        return s

    @jax.jit
    def lab_unpacked(i, idx):
        img, lab = augment_pair_batch(
            jax.random.fold_in(jax.random.PRNGKey(0), i),
            d_img[idx], d_lab[idx], crop=CROP,
            valid_hw=d_valid[idx], offsets=d_offs[idx])
        return checksum(img, lab)

    @jax.jit
    def lab_packed(i, idx):
        img, lab = augment_pair_batch(
            jax.random.fold_in(jax.random.PRNGKey(0), i),
            d_pk[idx], None, crop=CROP,
            valid_hw=d_valid[idx], offsets=d_offs[idx], packed=True)
        return checksum(img, lab)

    @jax.jit
    def unlab(i, idx):
        img, _ = augment_pair_batch(
            jax.random.fold_in(jax.random.PRNGKey(0), i),
            d_img[idx], None, crop=CROP,
            valid_hw=d_valid[idx], offsets=d_offs[idx])
        return checksum(img, None)

    @jax.jit
    def full_unpacked(i, li, ui):
        return lab_unpacked.__wrapped__(i, li) + unlab.__wrapped__(i, ui)

    @jax.jit
    def full_packed(i, li, ui):
        return lab_packed.__wrapped__(i, li) + unlab.__wrapped__(i, ui)

    rec = {
        "labeled_pair_unpacked_ms": round(time_fn(lab_unpacked, (lab_idx,), args.steps), 3),
        "labeled_pair_packed_ms": round(time_fn(lab_packed, (lab_idx,), args.steps), 3),
        "unlabeled_ms": round(time_fn(unlab, (unlab_idx,), args.steps), 3),
        "full_unpacked_ms": round(time_fn(full_unpacked, (lab_idx, unlab_idx), args.steps), 3),
        "full_packed_ms": round(time_fn(full_packed, (lab_idx, unlab_idx), args.steps), 3),
        "config": {"n_lab": N_LAB, "n_unlab": N_UNLAB, "canvas": CANVAS,
                   "crop": CROP, "steps": args.steps,
                   "platform": jax.default_backend()},
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

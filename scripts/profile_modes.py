"""Clean step-mode timings with per-feature-position IIC isolation."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import build_optimizer
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import init_train_state
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
    build_epoch_scan,
    build_train_step,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.models import ProjectorWrapper, UNet

K_ITERS = 30


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def main():
    dtype = jnp.bfloat16
    crop, num_classes = 224, 4
    n_lab, n_unlab = 4, 10
    key = jax.random.PRNGKey(0)
    batch = {
        "labeled_image": jax.random.uniform(key, (n_lab, crop, crop, 1), jnp.float32),
        "labeled_target": jax.random.randint(key, (n_lab, crop, crop), 0, num_classes, jnp.int32),
        "unlabeled_image": jax.random.uniform(key, (n_unlab, crop, crop, 1), jnp.float32),
    }
    configs = [
        ("partial", "partial", (), [1.0]),
        ("uda", "uda", (), [1.0]),
        ("iic:Conv5", "iic", ("Conv5",), [1.0]),
        ("iic:Up_conv3", "iic", ("Up_conv3",), [1.0]),
        ("iic:Up_conv2", "iic", ("Up_conv2",), [1.0]),
        ("iic:all", "iic", ("Conv5", "Up_conv3", "Up_conv2"), [1.0, 0.5, 0.5]),
        ("udaiic", "udaiic", ("Conv5", "Up_conv3", "Up_conv2"), [1.0, 0.5, 0.5]),
    ]
    for name, mode, feats, imp in configs:
        model = UNet(input_dim=1, num_classes=num_classes, dtype=dtype, bn_dtype=dtype)
        projector = None
        if feats:
            projector = ProjectorWrapper(
                feature_names=feats, num_clusters=20, num_subheads=5,
                head_types="linear", normalize=False, local_dtype=dtype, local_flat=True)
        tx = build_optimizer({"name": "Adam", "lr": 1e-7, "weight_decay": 1e-5})
        state = init_train_state(model, tx, (1, crop, crop, 1), seed=0,
                                 projector=projector,
                                 projector_feature_names=feats or None)
        dec = [f for f in feats if f.startswith("Up")]
        pads = {"Up_conv3": 1, "Up_conv2": 3}
        raw = build_train_step(
            model, tx, mode, num_classes=num_classes,
            feature_names=feats, feature_importance=imp,
            projector=projector, uda_criterion="mse", uda_weight=10.0,
            iic_weight=0.1, reg_weight=1.0,
            paddings=[pads[f] for f in dec] or 1, patch_sizes=1024, jit=False)
        epoch = build_epoch_scan(raw, K_ITERS, jit=True)
        stacked = {k: jnp.broadcast_to(v, (K_ITERS,) + v.shape) for k, v in batch.items()}
        epoch(jax.tree_util.tree_map(jnp.copy, state), stacked)  # compile
        st = jax.tree_util.tree_map(jnp.copy, state)
        _sync(st)
        t0 = time.perf_counter()
        out = epoch(st, stacked)
        _sync(out[1]["total_loss"])
        dt = (time.perf_counter() - t0) / K_ITERS * 1e3
        print(f"step[{name:12s}]: {dt:8.2f} ms  ({24/dt*1e3:7.1f} slices/s)", flush=True)


if __name__ == "__main__":
    main()

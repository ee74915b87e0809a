"""Decompose the udaiic step cost on real hardware.

All timings run K iterations inside ONE lax.scan program (single dispatch,
loop-carried data dependency via `x + c` with c ~ 1e-30 — multiplication
tricks like `x*(1+0*c)` get constant-folded and hoisted). Operands are
passed as jit ARGUMENTS (closure capture ships them as constants to the
remote compiler -> HTTP 413). Sync via scalar readback.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import build_optimizer
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import init_train_state
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
    build_epoch_scan,
    build_train_step,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.models import ProjectorWrapper, UNet
from mi_based_regularized_semi_supervised_segmentation_tpu.models.heads import group_softmax_flat

K_ITERS = 30


def scan_time(body, operands, iters=K_ITERS):
    """body(carry_scalar, *operands) -> scalar contribution (~0).
    Times one scan of `iters` sequential applications."""

    @jax.jit
    def run(c0, ops):
        def f(c, _):
            return c + body(c, *ops), None
        return jax.lax.scan(f, c0, None, length=iters)[0]

    c0 = jnp.zeros((), jnp.float32)
    _sync(run(c0, operands))
    t0 = time.perf_counter()
    _sync(run(c0, operands))
    return (time.perf_counter() - t0) / iters * 1e3


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def dep(x, c):
    """Un-foldable data dependency of x on scalar carry c."""
    return x + c.astype(x.dtype)


def main():
    dtype = jnp.bfloat16
    crop, num_classes = 224, 4
    n_lab, n_unlab = 4, 10
    feature_names = ("Conv5", "Up_conv3", "Up_conv2")
    key = jax.random.PRNGKey(0)

    batch = {
        "labeled_image": jax.random.uniform(key, (n_lab, crop, crop, 1), jnp.float32),
        "labeled_target": jax.random.randint(key, (n_lab, crop, crop), 0, num_classes, jnp.int32),
        "unlabeled_image": jax.random.uniform(key, (n_unlab, crop, crop, 1), jnp.float32),
    }

    # --- full steps via epoch scan (the production fast path) ---------------
    for mode in ("partial", "uda", "iic", "udaiic"):
        model = UNet(input_dim=1, num_classes=num_classes, dtype=dtype, bn_dtype=dtype)
        projector = ProjectorWrapper(
            feature_names=feature_names, num_clusters=20, num_subheads=5,
            head_types="linear", normalize=False, local_dtype=dtype, local_flat=True)
        tx = build_optimizer({"name": "Adam", "lr": 1e-7, "weight_decay": 1e-5})
        state = init_train_state(model, tx, (1, crop, crop, 1), seed=0,
                                 projector=projector,
                                 projector_feature_names=feature_names)
        raw = build_train_step(
            model, tx, mode, num_classes=num_classes,
            feature_names=feature_names, feature_importance=[1.0, 0.5, 0.5],
            projector=projector, uda_criterion="mse", uda_weight=10.0,
            iic_weight=0.1, reg_weight=1.0, paddings=[1, 3], patch_sizes=1024,
            jit=False)
        epoch = build_epoch_scan(raw, K_ITERS, jit=True)
        stacked_batches = {k: jnp.broadcast_to(v, (K_ITERS,) + v.shape)
                           for k, v in batch.items()}
        epoch(jax.tree_util.tree_map(jnp.copy, state), stacked_batches)  # compile
        st = jax.tree_util.tree_map(jnp.copy, state)
        _sync(st)
        t0 = time.perf_counter()
        out = epoch(st, stacked_batches)
        _sync(out[1]["total_loss"])
        dt = (time.perf_counter() - t0) / K_ITERS * 1e3
        print(f"step[{mode:8s}]: {dt:8.2f} ms  ({24/dt*1e3:7.1f} slices/s)")

    # --- pallas joint in isolation ------------------------------------------
    from mi_based_regularized_semi_supervised_segmentation_tpu.ops.pallas.mi_joint import (
        displaced_joint_pallas,
    )

    for name, (B, H, pad) in {
        "Up_conv2(p3,230^2)": (10, 224, 3),
        "Up_conv3(p1,114^2)": (10, 112, 1),
    }.items():
        Hp = H + 2 * pad
        x = jax.random.uniform(key, (B, Hp, Hp, 128), dtype)
        y = jax.random.uniform(key, (B, Hp, Hp, 128), dtype)
        D = (2 * pad + 1) ** 2
        N = B * Hp * Hp
        tflop_fwd = 2 * N * 128 * 128 * D / 1e12

        t_fwd = scan_time(
            lambda c, x, y: jnp.sum(
                displaced_joint_pallas(dep(x, c), y, pad, None, jnp.bfloat16, True)
            ) * 1e-30, (x, y))

        grad_fn = jax.grad(lambda a, b: jnp.sum(
            displaced_joint_pallas(a, b, pad, None, jnp.bfloat16, True)))
        t_fb = scan_time(
            lambda c, x, y: jnp.sum(grad_fn(dep(x, c), y)[0].astype(jnp.float32)) * 1e-30,
            (x, y))
        print(f"joint {name}: fwd {t_fwd:7.2f} ms ({tflop_fwd / (t_fwd/1e3):6.1f} TF/s)"
              f"  fwd+bwd {t_fb:7.2f} ms ({3*tflop_fwd/(t_fb/1e3):6.1f} TF/s of {197:.0f} peak)")

    # --- group softmax fwd+bwd at Up_conv2 shape ----------------------------
    z = jax.random.normal(key, (20, 230, 230, 128), dtype)
    t_sm = scan_time(
        lambda c, z: jnp.sum(group_softmax_flat(dep(z, c), 5, 20).astype(jnp.float32)) * 1e-30,
        (z,))
    g_sm = jax.grad(lambda a: jnp.sum(group_softmax_flat(a, 5, 20).astype(jnp.float32)))
    t_gsm = scan_time(
        lambda c, z: jnp.sum(g_sm(dep(z, c)).astype(jnp.float32)) * 1e-30, (z,))
    print(f"group_softmax fwd {t_sm:7.2f} ms   fwd+bwd {t_gsm:7.2f} ms")

    # --- MXU roofline anchor -------------------------------------------------
    M = 4096
    a = jax.random.uniform(key, (M, M), dtype)
    t_mm = scan_time(
        lambda c, a: jnp.sum((dep(a, c) @ a).astype(jnp.float32)) * 1e-30, (a,))
    print(f"matmul {M}^3 bf16: {t_mm:7.2f} ms ({2*M**3/1e12/(t_mm/1e3):6.1f} TF/s)")

    # --- UNet fwd / fwd+bwd --------------------------------------------------
    imgs = jnp.concatenate([batch["labeled_image"], batch["unlabeled_image"],
                            batch["unlabeled_image"]], axis=0)
    for bn_dtype, tag in ((dtype, "bf16 bn"), (jnp.float32, "fp32 bn")):
        model = UNet(input_dim=1, num_classes=num_classes, dtype=dtype, bn_dtype=bn_dtype)
        variables = model.init(key, jnp.zeros((1, crop, crop, 1)), train=False)

        t_f = scan_time(
            lambda c, p, x: jnp.sum(model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                dep(x, c), train=False).astype(jnp.float32)) * 1e-30,
            (variables["params"], imgs))

        def loss(params, x):
            logits, mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(logits.astype(jnp.float32) ** 2)
        g = jax.grad(loss)
        t_fb = scan_time(
            lambda c, p, x: jax.tree_util.tree_reduce(
                lambda s, v: s + jnp.sum(v).astype(jnp.float32),
                g(p, dep(x, c)), jnp.zeros((), jnp.float32)) * 1e-30,
            (variables["params"], imgs))
        print(f"UNet B=24 ({tag}): fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms")

    # --- per-layer conv costs (B=24, bf16, fwd) ------------------------------
    print("\nper-op fwd (B=24, bf16, train-mode BN):")
    shapes = [
        ("Conv1a 224^2 1->16", 224, 1, 16),
        ("Conv1b 224^2 16->16", 224, 16, 16),
        ("Conv2b 112^2 32->32", 112, 32, 32),
        ("Conv3b 56^2 64->64", 56, 64, 64),
        ("Conv4b 28^2 128->128", 28, 128, 128),
        ("Conv5b 14^2 256->256", 14, 256, 256),
        ("Upc5  28^2 256->128", 28, 256, 128),
        ("Upc4  56^2 128->64", 56, 128, 64),
        ("Upc3 112^2 64->32", 112, 64, 32),
        ("Upc2 224^2 32->16", 224, 32, 16),
    ]
    for name, H, cin, cout in shapes:
        x = jax.random.uniform(key, (24, H, H, cin), dtype)
        conv = nn.Conv(cout, (3, 3), padding=1, use_bias=False, dtype=dtype)
        cvars = conv.init(key, x)
        t = scan_time(
            lambda c, p, x: jnp.sum(conv.apply(p, dep(x, c)).astype(jnp.float32)) * 1e-30,
            (cvars, x))
        flops = 2 * 24 * H * H * 9 * cin * cout / 1e12
        print(f"  conv {name}: {t:7.3f} ms ({flops/(t/1e3):6.1f} TF/s)")

        bnmod = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                             dtype=dtype)
        y = jax.random.uniform(key, (24, H, H, cout), dtype)
        bvars = bnmod.init(key, y)
        t_bn = scan_time(
            lambda c, p, y: jnp.sum(bnmod.apply(
                p, dep(y, c), mutable=["batch_stats"])[0].astype(jnp.float32)) * 1e-30,
            (bvars, y))
        print(f"  bn   {name}: {t_bn:7.3f} ms")


if __name__ == "__main__":
    main()

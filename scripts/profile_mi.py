"""Accurate decomposition of the udaiic IIC branch on real TPU hardware.

Fixes the profile_step.py backward-timing flaw: gradients of linear
functionals of the joint don't depend on the differentiated input and get
hoisted out of the timing scan. Here every timed loss is sum(J*J)-shaped so
both VJP operands stay live.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

K_ITERS = 20


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def scan_time(body, operands, iters=K_ITERS):
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


def dep(x, c):
    return x + c.astype(x.dtype)


def main():
    from mi_based_regularized_semi_supervised_segmentation_tpu.models.heads import (
        group_softmax_flat,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.ops.iic_local import (
        mi_from_joint,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.ops.pallas.mi_joint import (
        displaced_joint_pallas,
    )

    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16

    print("== displaced joint (pre-padded canvases, bf16, S*K=100->128) ==")
    for name, (B, H, pad) in {
        "Up_conv2(p3,230^2)": (20, 224, 3),
        "Up_conv3(p1,114^2)": (20, 112, 1),
    }.items():
        Hp = H + 2 * pad
        x = jax.random.uniform(key, (B, Hp, Hp, 128), dtype)
        y = jax.random.uniform(key, (B, Hp, Hp, 128), dtype)
        D = (2 * pad + 1) ** 2
        N = B * Hp * Hp
        tflop_fwd = 2 * N * 128 * 128 * D / 1e12

        t_fwd = scan_time(
            lambda c, x, y: jnp.sum(
                displaced_joint_pallas(dep(x, c), dep(y, c), pad, None, jnp.bfloat16, True) ** 2
            ) * 1e-30, (x, y))

        def loss(a, b):
            j = displaced_joint_pallas(a, b, pad, None, jnp.bfloat16, True)
            return jnp.sum(j * j)

        grad_fn = jax.grad(loss, argnums=(0, 1))
        t_fb = scan_time(
            lambda c, x, y: sum(
                jnp.sum(g.astype(jnp.float32)) for g in grad_fn(dep(x, c), dep(y, c))
            ) * 1e-30, (x, y))
        print(f"  {name}: fwd {t_fwd:7.2f} ms ({tflop_fwd/(t_fwd/1e3):6.1f} TF/s)"
              f"   fwd+bwd {t_fb:7.2f} ms ({3*tflop_fwd/(t_fb/1e3):6.1f} TF/s vs 197 peak)")

    print("== group softmax (flat lanes) at Up_conv2 shape [20,230,230,128] ==")
    z = jax.random.normal(key, (20, 230, 230, 128), dtype)
    t_sm = scan_time(
        lambda c, z: jnp.sum(group_softmax_flat(dep(z, c), 5, 20).astype(jnp.float32) ** 2)
        * 1e-30, (z,))
    g_sm = jax.grad(lambda a: jnp.sum(group_softmax_flat(a, 5, 20).astype(jnp.float32) ** 2))
    t_gsm = scan_time(
        lambda c, z: jnp.sum(g_sm(dep(z, c)).astype(jnp.float32)) * 1e-30, (z,))
    print(f"  fwd {t_sm:7.2f} ms   fwd+bwd {t_gsm:7.2f} ms")

    print("== full Up_conv2 sub-branch: 1x1 conv head + pad + softmax + mask + joint + MI ==")
    # feature [20, 224, 224, 16] -> head -> [20, 230, 230, 128] padded probs
    feat = jax.random.uniform(key, (20, 224, 224, 16), dtype)
    w = jax.random.normal(key, (16, 128), dtype) * 0.1

    def branch(feat, w, pad=3):
        both = jnp.pad(feat, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        logits = both @ w  # 1x1 conv head (flat lanes)
        p = group_softmax_flat(logits, 5, 20)
        Hp, Wp = p.shape[1], p.shape[2]
        valid = jnp.pad(jnp.ones((Hp - 2 * pad, Wp - 2 * pad), p.dtype),
                        ((pad, pad), (pad, pad))).reshape(1, Hp, Wp, 1)
        p = p * valid
        p1, p2 = jnp.split(p, 2, axis=0)
        j = displaced_joint_pallas(p1, p2, pad, None, jnp.bfloat16, True)
        from mi_based_regularized_semi_supervised_segmentation_tpu.ops.iic_local import (
            _block_diagonal_subheads,
        )
        joint = _block_diagonal_subheads(j[:, :, :100, :100], 5, 20)
        per = jax.vmap(lambda jj: mi_from_joint(jj, 1.0), in_axes=2)(joint)
        return jnp.mean(per)

    t_br = scan_time(lambda c, f, w: branch(dep(f, c), w) * 1e-30, (feat, w))
    g_br = jax.grad(branch, argnums=(0, 1))
    t_gbr = scan_time(
        lambda c, f, w: sum(jnp.sum(g.astype(jnp.float32)) for g in g_br(dep(f, c), w))
        * 1e-30, (feat, w))
    print(f"  fwd {t_br:7.2f} ms   fwd+bwd {t_gbr:7.2f} ms")

    print("== MXU anchor ==")
    M = 4096
    a = jax.random.uniform(key, (M, M), dtype)
    t_mm = scan_time(
        lambda c, a: jnp.sum((dep(a, c) @ a).astype(jnp.float32)) * 1e-30, (a,))
    print(f"  matmul {M}^3 bf16: {t_mm:7.2f} ms ({2*M**3/1e12/(t_mm/1e3):6.1f} TF/s)")


if __name__ == "__main__":
    main()

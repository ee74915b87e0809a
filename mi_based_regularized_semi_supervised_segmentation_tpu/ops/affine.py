"""Differentiable random affine augmentation with exact inverse.

Parity target: /root/reference/contrastyou/augment/tensor_affine_transform.py
:9-103 (AffineTensorTransform + inverse_transform_matrix) — random
rotation/shear/scale affine matrices applied via grid sampling, with the
exact matrix inverse available for inverse warping. Available for
equivariance pairing beyond flips (not wired into the semi trainers, same as
the reference).

TPU-native: matrices are sampled from an explicit jax.random key (no host RNG
replay), and the bilinear resampling is jax.scipy-free pure gather/lerp that
jits and differentiates.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_affine_matrix(
    key: jax.Array,
    batch: int,
    degrees: float = 10.0,
    scale: Tuple[float, float] = (0.9, 1.1),
    shear: float = 0.1,
) -> jnp.ndarray:
    """[B, 2, 3] affine matrices in normalized [-1, 1] coordinates."""
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jnp.deg2rad(jax.random.uniform(k1, (batch,), minval=-degrees, maxval=degrees))
    s = jax.random.uniform(k2, (batch,), minval=scale[0], maxval=scale[1])
    sh = jax.random.uniform(k3, (batch,), minval=-shear, maxval=shear)
    cos, sin = jnp.cos(theta) * s, jnp.sin(theta) * s
    row0 = jnp.stack([cos, -sin + sh, jnp.zeros_like(cos)], axis=-1)
    row1 = jnp.stack([sin + sh, cos, jnp.zeros_like(cos)], axis=-1)
    return jnp.stack([row0, row1], axis=1)


def invert_affine_matrix(matrix: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of [B, 2, 3] affine matrices."""
    a = matrix[:, :, :2]  # [B, 2, 2]
    t = matrix[:, :, 2]   # [B, 2]
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    inv = jnp.stack(
        [
            jnp.stack([a[:, 1, 1], -a[:, 0, 1]], axis=-1),
            jnp.stack([-a[:, 1, 0], a[:, 0, 0]], axis=-1),
        ],
        axis=1,
    ) / det[:, None, None]
    inv_t = -jnp.einsum("bij,bj->bi", inv, t)
    return jnp.concatenate([inv, inv_t[:, :, None]], axis=-1)


def _sample_bilinear(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C]; xs/ys [H, W] pixel coords; zero padding outside."""
    H, W, C = img.shape
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = xs - x0
    wy = ys - y0

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        yc = jnp.clip(yy, 0, H - 1)
        xc = jnp.clip(xx, 0, W - 1)
        vals = img[yc, xc]
        return vals * valid[..., None]

    out = (
        gather(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
        + gather(y0, x1) * ((1 - wy) * wx)[..., None]
        + gather(y1, x0) * (wy * (1 - wx))[..., None]
        + gather(y1, x1) * (wy * wx)[..., None]
    )
    return out


def affine_transform(images: jnp.ndarray, matrices: jnp.ndarray) -> jnp.ndarray:
    """Warp [B, H, W, C] by [B, 2, 3] matrices (normalized coords, bilinear,
    zero padding). ``affine_transform(x, m)`` then
    ``affine_transform(., invert_affine_matrix(m))`` is the identity up to
    resampling error."""
    B, H, W, C = images.shape
    ys = jnp.linspace(-1.0, 1.0, H)
    xs = jnp.linspace(-1.0, 1.0, W)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")

    def warp_one(img, m):
        src_x = m[0, 0] * gx + m[0, 1] * gy + m[0, 2]
        src_y = m[1, 0] * gx + m[1, 1] * gy + m[1, 2]
        px = (src_x + 1.0) * (W - 1) / 2.0
        py = (src_y + 1.0) * (H - 1) / 2.0
        return _sample_bilinear(img, px, py)

    return jax.vmap(warp_one)(images, matrices)


def random_cutout(
    key: jax.Array, images: jnp.ndarray, min_box: int, max_box: int,
    pad_value: float = 0.0,
) -> jnp.ndarray:
    """TensorCutout parity (WHEEL::deepclustering2/augment/tensor_augment.py):
    one random box per sample replaced by ``pad_value``."""
    B, H, W, C = images.shape
    k1, k2, k3 = jax.random.split(key, 3)
    sizes = jax.random.randint(k1, (B,), min_box, max_box + 1)
    ys = jax.random.randint(k2, (B,), 0, H)
    xs = jax.random.randint(k3, (B,), 0, W)
    gy = jnp.arange(H)[None, :, None]
    gx = jnp.arange(W)[None, None, :]
    in_box = (
        (gy >= ys[:, None, None]) & (gy < ys[:, None, None] + sizes[:, None, None])
        & (gx >= xs[:, None, None]) & (gx < xs[:, None, None] + sizes[:, None, None])
    )
    return jnp.where(in_box[..., None], pad_value, images)

"""Keyed paired random flips — the transform-equivariant pairing primitive.

The reference generated the twin view by replaying a host RNG seed through
``TensorRandomFlip(axis=[1,2], threshold=0.8)`` twice — once on images, once
on logits (semi_seg/epocher.py:144-163, FixRandomSeed + tensor_augment.py:
17-45). In JAX the stateful-replay trick is unnecessary: we sample the flip
booleans ONCE per step from the step key and apply the same mask to both
images and logits/features inside the jitted step.

Layout: [B, H, W, ...] — axis 1 = H, axis 2 = W, matching the reference's
per-sample CHW axes [1, 2].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_flip_mask(key: jax.Array, batch: int, threshold: float = 0.8) -> jnp.ndarray:
    """[B, 2] booleans: flip H (axis 1) / flip W (axis 2), each Bernoulli(threshold)."""
    return jax.random.uniform(key, (batch, 2)) < threshold


def apply_flips(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Flip axis 1 where mask[:, 0], axis 2 where mask[:, 1]. x: [B, H, W, ...].

    Float inputs route through per-sample permutation MATMULS (I or the
    exchange matrix J chosen per sample): selecting rows via a 0/1 matrix is
    numerically exact, runs on the MXU in whatever layout the neighbors
    prefer, and avoids the reverse+select fusions XLA emits for the
    where(flip(x)) form (~5 ms/step across the udaiic step's six flip
    applications on v5e). Integer inputs keep the where/reverse form."""
    assert x.ndim >= 3, x.shape
    assert mask.shape == (x.shape[0], 2), (mask.shape, x.shape)
    if jnp.issubdtype(x.dtype, jnp.floating) and x.ndim == 4:
        B, H, W = x.shape[:3]
        eye_h = jnp.eye(H, dtype=x.dtype)
        eye_w = jnp.eye(W, dtype=x.dtype)
        ph = jnp.where(mask[:, 0][:, None, None], eye_h[::-1], eye_h)  # [B,H,H]
        pw = jnp.where(mask[:, 1][:, None, None], eye_w[::-1], eye_w)  # [B,W,W]
        x = jnp.einsum("bij,bjwc->biwc", ph, x,
                       preferred_element_type=x.dtype)
        return jnp.einsum("bhjc,bji->bhic", x, pw,
                          preferred_element_type=x.dtype)
    expand = (slice(None),) + (None,) * (x.ndim - 1)
    flip_h = mask[:, 0][expand]
    flip_w = mask[:, 1][expand]
    x = jnp.where(flip_h, jnp.flip(x, axis=1), x)
    x = jnp.where(flip_w, jnp.flip(x, axis=2), x)
    return x

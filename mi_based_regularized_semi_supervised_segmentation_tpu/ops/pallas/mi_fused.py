"""Fully fused displaced-MI joint: group-softmax + border-mask + joint in ONE
Pallas pass over the logit maps, with backward kernels that fuse the
softmax VJP and emit d(logits) directly.

Motivation (round-2 profile): in the unfused step the Up_conv2 branch spends
~31 ms/step on XLA elementwise/data-movement around a ~13 ms Pallas joint —
materializing [2*Bu, 230, 230, 128] probability maps in HBM (271 MB each),
masking them, and saving them as residuals costs ~5 GB of HBM traffic per
step. Fusing softmax+mask into the band kernels means probabilities live
only in VMEM: per step the branch reads the logits twice (fwd + bwd) and
writes d(logits) once, nothing else.

Semantics fused (reference: iic_loss.py:120-123 joint; the group softmax is
models/heads.py:group_softmax_flat; the border mask reproduces conv zero
padding):
    p_i = softmax(l_i / T) per K-lane group (S groups in the 128-lane axis,
          dead lanes excluded), zeroed outside each image's interior window
    J[dy, dx, k1, k2] = sum_n p1[n + off, k1] * p2[n, k2]

Backward, per upstream cotangent g[d] = dL/dJ[d]:
    dL/dp1[m] = sum_d p2m[m - off_d] @ g[d]^T        (p2m = masked probs)
    dL/dp2[n] = sum_d p1m[n + off_d] @ g[d]
    dl_i = (p_i .* dq - p_i .* ((p_i .* dq) @ G2)) / T,  dq = mask .* dL/dp_i
(G2 = within-group-sum broadcast matrix; softmax VJP per group.)

Layout identical to mi_joint.py: pre-padded [B, Hp, Wp, C] canvases flatten
row-major to [N, C] talls; displacement (dy, dx) = row offset dy*Wp + dx;
per-image borders guarantee no cross-image leakage. C must already be the
128-lane width (LocalClusterHead lane_multiple=128).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mi_joint import (
    LANE,
    _choose_band,
    _interpret,
    _pad_to_blocks,
    _round_up,
)


def _row_valid(first_tall_row, rows, n_real, hp, wp, p):
    """[rows, 1] f32 mask: tall row index -> 1.0 iff the row is a real,
    interior (non-border) pixel. Rows are tall indices starting at
    ``first_tall_row`` (may be negative for the shifted operand's pad)."""
    n = first_tall_row + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    in_range = (n >= 0) & (n < n_real)
    n_c = jnp.clip(n, 0, n_real - 1)
    rem = n_c % (hp * wp)
    y = rem // wp
    x = rem % wp
    interior = (y >= p) & (y < hp - p) & (x >= p) & (x < wp - p)
    return (in_range & interior).astype(jnp.float32)


def _group_softmax_block(z_in, S, K, T, valid, dot_dtype):
    """In-kernel group softmax over the 128-lane axis (+ border mask).
    z: [rows, C] logits; valid: [rows, 1] f32. Returns masked probs
    (dot_dtype, for the MXU) and the unmasked fp32 probs (for the VJP)."""
    C = z_in.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    live = lane < S * K
    z = jnp.where(live, z_in.astype(jnp.float32) / T, -jnp.inf)
    m = jnp.max(z, axis=-1, keepdims=True)
    e = jnp.exp(z - m)  # dead lanes: exp(-inf) = 0
    g2 = _g2_matrix(S, K, C, dot_dtype)
    denom = jax.lax.dot_general(
        e.astype(dot_dtype), g2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
    )
    p = e / (denom + 1e-16)  # dead lanes: 0 / eps = 0
    return (p * valid).astype(dot_dtype), p


def _g2_matrix(S, K, C, dtype):
    """[C, C] within-group-sum broadcast: g2[i, j] = 1 iff lanes i, j
    are live and in the same K-lane group."""
    i = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    same = (i // K == j // K) & (i < S * K) & (j < S * K)
    return same.astype(dtype)


def _softmax_vjp_block(p_f32, dq, S, K, C, T, dot_dtype, out_dtype):
    """dl = (p .* dq - p .* ((p .* dq) @ G2)) / T."""
    t = p_f32 * dq
    g2 = _g2_matrix(S, K, C, dot_dtype)
    s = jax.lax.dot_general(
        t.astype(dot_dtype), g2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
    )
    return ((t - p_f32 * s) / T).astype(out_dtype)


def _fwd_kernel(offsets, band, cp, S, K, T, shift, n_real, hp, wp, p, dot_dtype):
    """Band cache (round-3): the 2-band A window of step i shares its second
    half with step i+1's first half — a VMEM scratch carries the masked
    probs across sequential grid steps so each A row's softmax runs ONCE
    (2 softmax bands/step instead of 3; the serialized VPU softmax was the
    fused path's loss vs the unfused kernel)."""

    def kernel(a_ref, a_next_ref, b_ref, out_ref, cache_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            va0 = _row_valid(-shift, band, n_real, hp, wp, p)
            p0, _ = _group_softmax_block(a_ref[...], S, K, T, va0, dot_dtype)
            cache_ref[...] = p0

        va1 = _row_valid(i * band - shift + band, band, n_real, hp, wp, p)
        p1, _ = _group_softmax_block(a_next_ref[...], S, K, T, va1, dot_dtype)
        a_p = jnp.concatenate([cache_ref[...], p1], axis=0)
        cache_ref[...] = p1  # becomes step i+1's first half

        vb = _row_valid(i * band, band, n_real, hp, wp, p)
        b_p, _ = _group_softmax_block(b_ref[...], S, K, T, vb, dot_dtype)

        for d, off in enumerate(offsets):
            slab = jax.lax.slice(a_p, (off, 0), (off + band, cp))
            j = jax.lax.dot_general(
                slab, b_p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            out_ref[d, :, :] += j

    return kernel


def _bwd_kernel(offsets, band, cp, S, K, T, src_shift, own_start_shift,
                n_real, hp, wp, p, transpose_g, dot_dtype, out_dtype):
    """d(own logits)[band] from shifted src-prob slabs + own softmax VJP.

    src refs: 2-band block of the OTHER side's logits laid out so slab d
    starts at row offset offsets[d]; own_ref: this side's logit band.
    own tall row of kernel row r = i*band + r + own_start_shift (0 here;
    kept explicit for clarity)."""

    def kernel(src_ref, src_next_ref, own_ref, g_ref, out_ref, cache_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            vs0 = _row_valid(-src_shift, band, n_real, hp, wp, p)
            p0, _ = _group_softmax_block(src_ref[...], S, K, T, vs0, dot_dtype)
            cache_ref[...] = p0

        vs1 = _row_valid(i * band - src_shift + band, band, n_real, hp, wp, p)
        p1, _ = _group_softmax_block(src_next_ref[...], S, K, T, vs1, dot_dtype)
        src_p = jnp.concatenate([cache_ref[...], p1], axis=0)
        cache_ref[...] = p1

        dq = jnp.zeros((band, cp), jnp.float32)
        for d, off in enumerate(offsets):
            slab = jax.lax.slice(src_p, (off, 0), (off + band, cp))
            g = g_ref[d, :, :].astype(dot_dtype)
            if transpose_g:
                dq += jax.lax.dot_general(
                    slab, g, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                )
            else:
                dq += jax.lax.dot_general(
                    slab, g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                )

        vo = _row_valid(i * band + own_start_shift, band, n_real, hp, wp, p)
        _, own_p = _group_softmax_block(own_ref[...], S, K, T, vo, dot_dtype)
        out_ref[...] = _softmax_vjp_block(own_p, dq * vo, S, K, cp, T,
                                          dot_dtype, out_dtype)

    return kernel


def _flatten(x):
    B, H, W, C = x.shape
    return x.reshape(B * H * W, C)


def _fused_fwd(l1, l2, padding, S, K, T, band, dot_dtype):
    B, Hp, Wp, C = l1.shape
    assert C == _round_up(C, LANE), (C,)  # head must emit lane-width logits
    p = padding
    Tt = 2 * p + 1
    D = Tt * Tt
    shift = p * Wp + p
    offsets = [dy * Wp + dx for dy in range(Tt) for dx in range(Tt)]
    a_tall = _flatten(l1)
    b_tall = _flatten(l2)
    n_real = a_tall.shape[0]
    if band is None:
        band = _choose_band(n_real, offsets[-1])
    assert offsets[-1] < band, (offsets[-1], band)
    nbands = -(-n_real // band)
    a_pad = _pad_to_blocks(a_tall, shift, nbands, band)
    if n_real != nbands * band:
        b_tall = jnp.pad(b_tall, ((0, nbands * band - n_real), (0, 0)))

    out = pl.pallas_call(
        _fwd_kernel(offsets, band, C, S, K, T, shift, n_real, Hp, Wp, p, dot_dtype),
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec((band, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, C), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, C, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((band, C), dot_dtype)],
        interpret=_interpret(),
    )(a_pad, a_pad, b_tall)
    return out.reshape(Tt, Tt, C, C)


def _fused_bwd(l1, l2, g, padding, S, K, T, band, dot_dtype):
    B, Hp, Wp, C = l1.shape
    p = padding
    Tt = 2 * p + 1
    D = Tt * Tt
    shift = p * Wp + p
    offsets = [dy * Wp + dx for dy in range(Tt) for dx in range(Tt)]
    max_off = offsets[-1]
    a_tall = _flatten(l1)
    b_tall = _flatten(l2)
    n_real = a_tall.shape[0]
    if band is None:
        band = _choose_band(n_real, max_off)
    nbands = -(-n_real // band)
    g_f32 = g.reshape(D, C, C).astype(jnp.float32)

    def pad_own(tall):
        if n_real != nbands * band:
            return jnp.pad(tall, ((0, nbands * band - n_real), (0, 0)))
        return tall

    # dl2: src = l1 slabs at offsets (shift-down layout), own = l2
    a_pad = _pad_to_blocks(a_tall, shift, nbands, band)
    dl2 = pl.pallas_call(
        _bwd_kernel(offsets, band, C, S, K, T, shift, 0,
                    n_real, Hp, Wp, p, transpose_g=False,
                    dot_dtype=dot_dtype, out_dtype=l2.dtype),
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec((band, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, C), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbands * band, C), l2.dtype),
        scratch_shapes=[pltpu.VMEM((band, C), dot_dtype)],
        interpret=_interpret(),
    )(a_pad, a_pad, pad_own(b_tall), g_f32)

    # dl1[m] = sum_d p2m[m - off_d] @ g[d]^T; with the shift-down layout of
    # l2 the reversed offsets max_off - off_d are all >= 0.
    rev_offsets = [max_off - off for off in offsets]
    b_pad = _pad_to_blocks(b_tall, shift, nbands, band)
    dl1 = pl.pallas_call(
        _bwd_kernel(rev_offsets, band, C, S, K, T, shift, 0,
                    n_real, Hp, Wp, p, transpose_g=True,
                    dot_dtype=dot_dtype, out_dtype=l1.dtype),
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec((band, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, C), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbands * band, C), l1.dtype),
        scratch_shapes=[pltpu.VMEM((band, C), dot_dtype)],
        interpret=_interpret(),
    )(b_pad, b_pad, pad_own(a_tall), g_f32)

    def unflatten(tall):
        return tall[:n_real].reshape(B, Hp, Wp, C)

    return unflatten(dl1), unflatten(dl2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def displaced_joint_softmax_pallas(
    l1: jnp.ndarray,
    l2: jnp.ndarray,
    padding: int,
    S: int,
    K: int,
    T: float = 1.0,
    band=None,
    dot_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Pre-padded logit canvases [B, Hp, Wp, 128] x2 -> [Tt, Tt, 128, 128]
    raw displaced correlation sums of the masked group-softmax probabilities.
    Gradients flow to the logits (softmax VJP fused into the band kernels)."""
    return _fused_fwd(l1, l2, padding, S, K, T, band, dot_dtype)


def _vjp_fwd(l1, l2, padding, S, K, T, band, dot_dtype):
    return _fused_fwd(l1, l2, padding, S, K, T, band, dot_dtype), (l1, l2)


def _vjp_bwd(padding, S, K, T, band, dot_dtype, res, g):
    l1, l2 = res
    dl1, dl2 = _fused_bwd(l1, l2, g, padding, S, K, T, band, dot_dtype)
    return dl1.astype(l1.dtype), dl2.astype(l2.dtype)


displaced_joint_softmax_pallas.defvjp(_vjp_fwd, _vjp_bwd)

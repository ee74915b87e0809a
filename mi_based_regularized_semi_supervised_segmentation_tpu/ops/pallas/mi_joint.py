"""Fused Pallas TPU kernel for the displaced-MI joint distribution.

Computes J[dy, dx, k1, k2] = sum_{b,y,x} x[b, y+dy, x+dx, k1] * x_tf[b, y, x, k2]
(the reference's F.conv2d joint, iic_loss.py:120-123) plus its two VJP terms,
as band-pipelined MXU kernels.

Formulation: each [B, H, W, C] map is zero-padded per image to [H+2p, W+2p]
rows/cols and flattened row-major into one tall [N, C] matrix. A 2-D spatial
displacement (dy, dx) then becomes the single 1-D row offset
dy*(W+2p) + dx, and per-image padding guarantees shifts never leak across
image boundaries. Each grid step loads one row band (plus the next band, to
cover the shift overhang) into VMEM and performs one (C x band) @ (band x C)
MXU contraction per displacement, accumulating the [T*T, C, C] joint in VMEM
— every input element is read from HBM exactly once per pass, versus once per
displacement (49x at p=3) for the per-displacement XLA formulation.

Backward shares the same skeleton:
  dX[m]   = sum_d  X_tf[m - off_d] @ g[d]^T   (shift-reversed band kernel)
  dX_tf[n] = sum_d X[n + off_d] @ g[d]        (same slabs as forward)

Channels are padded to the 128-lane width (cluster-head probs are S*K = 100
-> 128), so every MXU tile is full. Inputs are cast to bf16 for the MXU with
fp32 accumulation (preferred_element_type) — probabilities in [0,1] lose
~1e-3 relative precision, the fp32-HIGHEST XLA path remains available for
parity testing via backend='xla'.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_BAND = 1536
# Largest band whose BACKWARD kernel fits the 16 MB scoped-VMEM stack:
# double-buffered [band, cp] src/src_next/out blocks + 4 f32 accumulators
# + the [D, cp, cp] f32 cotangent. A 2832-row divisor band (chosen for the
# s2d half-grid feature geometry, B=10/118x120/p=3) OOMed the Mosaic
# scoped allocation at 17.37 MB on v5e; 2048 fits with margin. Bands are
# only allowed past this cap when max_off forces it (very wide rows).
MAX_BAND = 2048


def _choose_band(n_rows: int, max_off: int) -> int:
    """Largest band (multiple of 8, > max_off, <= cap) dividing n_rows —
    a divisor means zero row-padding copies for the unshifted operand. The
    cap is MAX_BAND (scoped-VMEM budget, see above) unless the displacement
    reach max_off itself exceeds it."""
    floor = _round_up(max_off + 1, 8)
    cap = max(MAX_BAND, floor)
    best = 0
    b = floor
    while b <= cap:
        if n_rows % b == 0:
            best = b
        b += 8
    return best or max(DEFAULT_BAND, floor)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flatten_padded(x: jnp.ndarray, padding: int, cp: int,
                    pre_padded: bool = False) -> Tuple[jnp.ndarray, int]:
    """[B, H, W, C] -> tall [B*(H+2p)*(W+2p), cp] row-major with per-image
    zero borders and channel pad. Returns (tall, wp). With ``pre_padded``,
    x already carries the zero spatial borders ([B, H+2p, W+2p, C]) and only
    the channel pad (or nothing) is applied — the flatten is a free reshape."""
    B, H, W, C = x.shape
    p = padding
    if pre_padded:
        if C != cp:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - C)))
        return x.reshape(B * H * W, cp), W
    wp = W + 2 * p
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, cp - C)))
    return x.reshape(B * (H + 2 * p) * wp, cp), wp


def _band_kernel_fwd(offsets, band, cp, dot_dtype):
    def kernel(a_ref, a_next_ref, b_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        full = jnp.concatenate([a_ref[...], a_next_ref[...]], axis=0)  # [2*band, cp]
        b = b_ref[...].astype(dot_dtype)
        for d, off in enumerate(offsets):
            slab = jax.lax.slice(full, (off, 0), (off + band, cp)).astype(dot_dtype)
            j = jax.lax.dot_general(
                slab, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            out_ref[d, :, :] += j

    return kernel


def _band_kernel_bwd(offsets, band, cp, dot_dtype, transpose_g, n_acc: int = 4):
    """out[m] = sum_d full[m + off_d] @ (g[d] or g[d]^T).

    Accumulation is spread over ``n_acc`` independent accumulators: a single
    acc += dot(...) chain serializes the MXU on the read-after-write (61% of
    the forward kernel's rate measured on v5e); independent chains restore
    the pipeline."""

    def kernel(src_ref, src_next_ref, g_ref, out_ref):
        full = jnp.concatenate([src_ref[...], src_next_ref[...]], axis=0)
        accs = [jnp.zeros((band, cp), jnp.float32) for _ in range(n_acc)]
        for d, off in enumerate(offsets):
            slab = jax.lax.slice(full, (off, 0), (off + band, cp)).astype(dot_dtype)
            g = g_ref[d, :, :].astype(dot_dtype)
            if transpose_g:
                j = jax.lax.dot_general(
                    slab, g, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                )
            else:
                j = jax.lax.dot_general(
                    slab, g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
                )
            accs[d % n_acc] += j
        total = accs[0]
        for a in accs[1:]:
            total += a
        out_ref[...] = total

    return kernel


def _pad_to_blocks(tall: jnp.ndarray, top: int, nbands: int, band: int) -> jnp.ndarray:
    """Shift down by ``top`` zero rows and zero-pad to (nbands+1)*band rows."""
    total = (nbands + 1) * band
    return jnp.pad(tall, ((top, total - tall.shape[0] - top), (0, 0)))


def _joint_fwd_call(x, x_tf, padding, band, dot_dtype, pre_padded=False):
    B, H, W, C = x.shape
    p = padding
    T = 2 * p + 1
    cp = _round_up(C, LANE)
    a_tall, wp = _flatten_padded(x, p, cp, pre_padded)
    b_tall, _ = _flatten_padded(x_tf, p, cp, pre_padded)
    # Both talls share the same row layout; the displacement (dy, dx) maps to
    # x-row  n + (dy-p)*wp + (dx-p).  Shifting A down by shift = p*wp + p
    # makes all slab offsets non-negative: A[n + dy*wp + dx].
    shift = p * wp + p
    offsets = [dy * wp + dx for dy in range(T) for dx in range(T)]
    n_rows = b_tall.shape[0]
    if band is None:
        band = _choose_band(n_rows, offsets[-1])
    assert offsets[-1] < band, (offsets[-1], band)
    nbands = -(-n_rows // band)
    # A (the shifted operand, block specs i and i+1) always needs the
    # shift+lookahead padding copy; B (block spec i only) needs none when the
    # band divides its rows — _choose_band aims for exactly that.
    a_tall = _pad_to_blocks(a_tall, shift, nbands, band)
    if n_rows != nbands * band:
        b_tall = jnp.pad(b_tall, ((0, nbands * band - n_rows), (0, 0)))

    D = T * T
    out = pl.pallas_call(
        _band_kernel_fwd(offsets, band, cp, dot_dtype),
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec((band, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, cp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, cp, cp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, cp, cp), jnp.float32),
        interpret=_interpret(),
    )(a_tall, a_tall, b_tall)
    return out.reshape(T, T, cp, cp)[:, :, :C, :C]


def _unflatten(tall: jnp.ndarray, B: int, H: int, W: int, C: int, padding: int,
               pre_padded: bool = False) -> jnp.ndarray:
    p = padding
    if pre_padded:
        tall = tall[: B * H * W]
        return tall.reshape(B, H, W, tall.shape[-1])[..., :C]
    wp = W + 2 * p
    tall = tall[: B * (H + 2 * p) * wp]
    grid = tall.reshape(B, H + 2 * p, wp, tall.shape[-1])
    return grid[:, p:p + H, p:p + W, :C]


def _joint_bwd_call(x, x_tf, g, padding, band, dot_dtype, pre_padded=False):
    """Returns (dx, dx_tf) for upstream cotangent g [T, T, C, C]."""
    B, H, W, C = x.shape
    p = padding
    T = 2 * p + 1
    D = T * T
    cp = _round_up(C, LANE)
    wp = W if pre_padded else W + 2 * p
    shift = p * wp + p
    offsets = [dy * wp + dx for dy in range(T) for dx in range(T)]
    max_off = offsets[-1]  # == 2 * shift

    g_pad = jnp.zeros((D, cp, cp), jnp.float32)
    g_pad = g_pad.at[:, :C, :C].set(g.reshape(D, C, C).astype(jnp.float32))

    a_tall, _ = _flatten_padded(x, p, cp, pre_padded)
    b_tall, _ = _flatten_padded(x_tf, p, cp, pre_padded)
    n_rows = a_tall.shape[0]
    if band is None:
        band = _choose_band(n_rows, max_off)
    assert max_off < band
    nbands = -(-n_rows // band)

    # --- dx_tf[n] = sum_d A[n + off_d] @ g[d] : same slabs as forward -----
    a_pad = _pad_to_blocks(a_tall, shift, nbands, band)
    d_btall = pl.pallas_call(
        _band_kernel_bwd(offsets, band, cp, dot_dtype, transpose_g=False),
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec((band, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, cp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, cp, cp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbands * band, cp), jnp.float32),
        interpret=_interpret(),
    )(a_pad, a_pad, g_pad)
    dx_tf = _unflatten(d_btall, B, H, W, C, p, pre_padded)

    # --- dx[u] = sum_d B[u - ((dy-p)*wp + (dx-p))] @ g[d]^T ---------------
    # With BS[r] = B[r - shift]: B[u + shift - off_d] = BS[u + max_off - off_d],
    # so the reversed offsets max_off - off_d are all >= 0.
    rev_offsets = [max_off - off for off in offsets]
    b_shift = _pad_to_blocks(b_tall, shift, nbands, band)
    d_atall = pl.pallas_call(
        _band_kernel_bwd(rev_offsets, band, cp, dot_dtype, transpose_g=True),
        grid=(nbands,),
        in_specs=[
            pl.BlockSpec((band, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((band, cp), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, cp, cp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbands * band, cp), jnp.float32),
        interpret=_interpret(),
    )(b_shift, b_shift, g_pad)
    dx = _unflatten(d_atall, B, H, W, C, p, pre_padded)
    return dx, dx_tf


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def displaced_joint_pallas(
    x: jnp.ndarray,
    x_tf: jnp.ndarray,
    padding: int,
    band=None,
    dot_dtype=jnp.bfloat16,
    pre_padded: bool = False,
) -> jnp.ndarray:
    """[B, H, W, C] x2 -> [T, T, C, C] raw displaced correlation sums.
    With ``pre_padded``, inputs already carry zero spatial borders
    ([B, H+2p, W+2p, C]) and the flatten is a free reshape."""
    return _joint_fwd_call(x, x_tf, padding, band, dot_dtype, pre_padded)


def _vjp_fwd(x, x_tf, padding, band, dot_dtype, pre_padded):
    return _joint_fwd_call(x, x_tf, padding, band, dot_dtype, pre_padded), (x, x_tf)


def _vjp_bwd(padding, band, dot_dtype, pre_padded, res, g):
    x, x_tf = res
    dx, dx_tf = _joint_bwd_call(x, x_tf, g, padding, band, dot_dtype, pre_padded)
    return dx.astype(x.dtype), dx_tf.astype(x_tf.dtype)


displaced_joint_pallas.defvjp(_vjp_fwd, _vjp_bwd)

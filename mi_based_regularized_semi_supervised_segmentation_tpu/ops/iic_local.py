"""Local (spatially displaced) IIC segmentation MI loss.

Parity target: /root/reference/contrastyou/losses/iic_loss.py:97-189
(IIDSegmentationLoss + IIDSegmentationSmallPathLoss + patch_generator).

The reference computes the K x K x T x T displaced joint with
``F.conv2d(x_out.permute(1,0,2,3), weight=x_tf_out.permute(1,0,2,3))`` —
treating clusters as conv batch/filters with an HxW-sized kernel. That trick
maps terribly onto the TPU MXU (C=20 "batch", giant kernel). Here the joint is
expressed TPU-first:

  J[dy, dx, k1, k2] = sum_{b,y,x} x[b, y+dy, x+dx, k1] * x_tf[b, y, x, k2]

as (2p+1)^2 shifted-slice contractions (``displaced_joint_xla``, pure XLA
dot_generals) or as a single fused Pallas kernel that reads the feature maps
once (``ops.pallas.mi_joint``, used when backend='pallas'/'auto' on TPU).

Layout: inputs are [B, H, W, K] simplex maps (K last); an optional leading
subhead axis [S, B, H, W, K] is vmapped. The joint post-processing
(min-subtraction, per-displacement normalization, symmetrization, MI) is
cheap ((2p+1)^2 * K^2 elements) and stays in plain jnp, matching the
reference formula exactly (iic_loss.py:124-148).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def displaced_joint_xla(x: jnp.ndarray, x_tf: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Raw displaced correlation sums, shape [T, T, K, K] with T = 2p+1.

    J[p+dy, p+dx, k1, k2] = sum_{b,y,x} x[b, y+dy, x+dx, k1] * x_tf[b, y, x, k2]
    with zero contribution outside the image (the conv zero-padding semantics).
    """
    assert x.ndim == 4 and x.shape == x_tf.shape, (x.shape, x_tf.shape)
    B, H, W, K = x.shape
    p = padding
    rows = []
    for dy in range(-p, p + 1):
        cols = []
        y0, y1 = max(0, -dy), min(H, H - dy)
        for dx in range(-p, p + 1):
            x0, x1 = max(0, -dx), min(W, W - dx)
            a = jax.lax.slice(x, (0, y0 + dy, x0 + dx, 0), (B, y1 + dy, x1 + dx, K))
            b = jax.lax.slice(x_tf, (0, y0, x0, 0), (B, y1, x1, K))
            j = jnp.einsum(
                "bhwk,bhwl->kl",
                a.astype(jnp.float32),
                b.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            cols.append(j)
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # [T, T, K, K]


def displaced_joint(
    x: jnp.ndarray, x_tf: jnp.ndarray, padding: int, backend: str = "auto"
) -> jnp.ndarray:
    """Dispatch between the XLA reference paths and the fused Pallas kernel."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla_banded"
    if backend == "xla":
        return displaced_joint_xla(x, x_tf, padding)
    if backend == "xla_scan":
        return displaced_joint_xla_subheads_scan(
            x[:, :, :, None, :], x_tf[:, :, :, None, :], padding
        )[:, :, 0]
    if backend == "xla_banded":
        return displaced_joint_xla_banded(x, x_tf, padding)
    if backend == "pallas":
        from .pallas.mi_joint import displaced_joint_pallas

        return displaced_joint_pallas(x, x_tf, padding)
    raise ValueError(f"unknown backend {backend!r}")


def mi_from_joint(joint: jnp.ndarray, lamb: float = 1.0) -> jnp.ndarray:
    """Min-subtract + normalize + symmetrize + negative-MI, per displacement.

    joint: [T, T, K, K] raw sums. Follows iic_loss.py:124-148 exactly:
    global min subtraction (detached), per-(t1,t2) normalization over both
    cluster axes, k-symmetrization, then
    loss = sum(-P*(log P - lamb log Pi - lamb log Pj)) / T^2.
    """
    T = joint.shape[0]
    k = joint.shape[-1]
    p = joint - jax.lax.stop_gradient(jnp.min(joint)) + 1e-16
    p = p / jnp.sum(p, axis=(2, 3), keepdims=True)
    p = (p + jnp.swapaxes(p, 2, 3)) / 2.0
    p_i = jnp.sum(p, axis=2, keepdims=True)  # marginal over k1 -> [T,T,1,K]
    p_j = jnp.sum(p, axis=3, keepdims=True)  # marginal over k2 -> [T,T,K,1]
    log_p = jnp.log(p + 1e-16)
    log_pi = jnp.log(jnp.broadcast_to(p_i, p.shape) + 1e-16)
    log_pj = jnp.log(jnp.broadcast_to(p_j, p.shape) + 1e-16)
    loss = -p * (log_p - lamb * log_pi - lamb * log_pj)
    return jnp.sum(loss) / (T * T)


def iid_segmentation_loss(
    x_out: jnp.ndarray,
    x_tf_out: jnp.ndarray,
    padding: int = 7,
    lamb: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Displaced-MI loss over per-pixel cluster simplexes [B, H, W, K]."""
    if mask is not None:
        mask = jax.lax.stop_gradient(mask)
        x_out = x_out * mask
        x_tf_out = x_tf_out * mask
    joint = displaced_joint(x_out, x_tf_out, padding, backend=backend)
    return mi_from_joint(joint, lamb=lamb)


def _tile_offsets(size: int, patch: int, step: int) -> Tuple[int, ...]:
    """Reference patch_generator offsets (iic_loss.py:152-161): arange(0,
    size-patch, step) plus max(size-patch, 0)."""
    offsets = list(range(0, max(size - patch, 0), step))
    offsets.append(max(size - patch, 0))
    return tuple(offsets)


def iid_segmentation_small_patch_loss(
    x_out: jnp.ndarray,
    x_tf_out: jnp.ndarray,
    padding: int = 7,
    patch_size: int = 32,
    lamb: float = 1.0,
    mask: Optional[jnp.ndarray] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Tile the maps (patch, stride=patch//2) and average the displaced-MI
    loss per tile. With patch_size >= H (the headline config's 1024) this
    degenerates to a single full-map tile, as in the reference."""
    assert x_out.shape == x_tf_out.shape
    B, H, W, K = x_out.shape
    ph, pw = min(patch_size, H), min(patch_size, W)
    step = max(patch_size // 2, 1)
    losses = []
    for hy in _tile_offsets(H, patch_size, step):
        for wx in _tile_offsets(W, patch_size, step):
            sl = (slice(None), slice(hy, hy + ph), slice(wx, wx + pw), slice(None))
            m = None if mask is None else mask[sl]
            losses.append(
                iid_segmentation_loss(
                    x_out[sl], x_tf_out[sl], padding=padding, lamb=lamb, mask=m, backend=backend
                )
            )
    return sum(losses) / len(losses)


def displaced_joint_xla_banded(
    x: jnp.ndarray,
    x_tf: jnp.ndarray,
    padding: int,
    band_rows: int = 8,
    precision=None,
) -> jnp.ndarray:
    """MXU-efficient displaced joint over channel-flattened maps.

    x, x_tf: [B, H, W, C] (C may be subheads*clusters). Returns [T, T, C, C].

    Instead of (2p+1)^2 skinny einsums (20-wide outputs -> ~15% MXU tiles),
    each row band materializes the 49-shift stack once ([B, Rb, W, T*T, C],
    a few tens of MB) and contracts it against the band in ONE dot with a
    [T*T*C, C] output — full MXU tiles, and each input element is read from
    HBM once per band instead of 49 times. bf16/DEFAULT precision inputs with
    fp32 accumulation by default (preferred_element_type).
    """
    assert x.ndim == 4 and x.shape == x_tf.shape, (x.shape, x_tf.shape)
    B, H, W, C = x.shape
    p = padding
    T = 2 * p + 1
    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = jnp.zeros((T, T, C, C), jnp.float32)
    for h0 in range(0, H, band_rows):
        rb = min(band_rows, H - h0)
        xtf_band = x_tf[:, h0:h0 + rb]  # [B, rb, W, C]
        shifts = jnp.stack(
            [
                jax.lax.slice(xp, (0, h0 + dy, dx, 0), (B, h0 + dy + rb, dx + W, C))
                for dy in range(T)
                for dx in range(T)
            ],
            axis=3,
        )  # [B, rb, W, T*T, C]
        j = jnp.einsum(
            "brwdc,brwe->dce",
            shifts,
            xtf_band,
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [T*T, C, C]
        out = out + j.reshape(T, T, C, C)
    return out


def displaced_joint_xla_subheads(x: jnp.ndarray, x_tf: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Subhead-batched displaced joint: x, x_tf [B, H, W, S, K] ->
    [T, T, S, K, K]. All S subheads share one contraction per displacement
    (einsum 'bhwsk,bhwsl->skl'), keeping the MXU fed instead of S tiny calls."""
    assert x.ndim == 5 and x.shape == x_tf.shape, (x.shape, x_tf.shape)
    B, H, W, S, K = x.shape
    p = padding
    rows = []
    for dy in range(-p, p + 1):
        cols = []
        y0, y1 = max(0, -dy), min(H, H - dy)
        for dx in range(-p, p + 1):
            x0, x1 = max(0, -dx), min(W, W - dx)
            a = jax.lax.slice(x, (0, y0 + dy, x0 + dx, 0, 0), (B, y1 + dy, x1 + dx, S, K))
            b = jax.lax.slice(x_tf, (0, y0, x0, 0, 0), (B, y1, x1, S, K))
            j = jnp.einsum(
                "bhwsk,bhwsl->skl",
                a.astype(jnp.float32),
                b.astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            cols.append(j)
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # [T, T, S, K, K]


def displaced_joint_xla_subheads_scan(
    x: jnp.ndarray, x_tf: jnp.ndarray, padding: int
) -> jnp.ndarray:
    """Memory-bounded fp32 displaced joint: same numerics as
    ``displaced_joint_xla_subheads`` but ``lax.scan`` over the (2p+1)^2
    displacements of a zero-padded copy of ``x``.

    The per-displacement einsum backward materializes a [B, H, W, S, K] f32
    temp per displacement; the unrolled variant lets XLA keep many of them
    live at once (fp32 + B=10 OOMs a 16 GB chip by ~0.5 GB at paddings
    [1, 3]). Scanning serializes the backward to ONE displacement temp plus
    the accumulated input gradient. Zero-padding contributes exact zeros to
    the sums, so values match the sliced formulation (conv zero-padding
    semantics, iic_loss.py:117-123) bit-for-bit up to summation order.

    The body is wrapped in ``jax.checkpoint``: without it, scan AD stacks the
    per-iteration sliced view ``a`` as a [T², B, H, W, S, K] f32 residual —
    12.6 GB at padding 3, B=10 — re-creating the very OOM this path exists
    to avoid (measured 16.29 G requested on a 15.75 G v5e). Rematerializing
    the dynamic_slice in the backward costs one extra slice per displacement
    and caps the residuals at the zero-padded input copy."""
    assert x.ndim == 5 and x.shape == x_tf.shape, (x.shape, x_tf.shape)
    B, H, W, S, K = x.shape
    p = padding
    T = 2 * p + 1
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (p, p), (p, p), (0, 0), (0, 0)))
    xtf = x_tf.astype(jnp.float32)
    offsets = jnp.array(
        [(dy, dx) for dy in range(T) for dx in range(T)], jnp.int32
    )

    def body(carry, off):
        a = jax.lax.dynamic_slice(
            xp, (0, off[0], off[1], 0, 0), (B, H, W, S, K)
        )
        j = jnp.einsum(
            "bhwsk,bhwsl->skl",
            a,
            xtf,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return carry, j

    _, joints = jax.lax.scan(jax.checkpoint(body), 0, offsets)  # [T*T, S, K, K]
    return joints.reshape(T, T, S, K, K)


def iid_segmentation_loss_subheads(
    x_out: jnp.ndarray,
    x_tf_out: jnp.ndarray,
    padding: int,
    lamb: float = 1.0,
    backend: str = "auto",
    pre_padded: bool = False,
) -> jnp.ndarray:
    """Mean over subheads of the displaced-MI loss; inputs [B, H, W, S, K]
    (reference: per-subhead criterion then average_iter,
    semi_seg/epocher.py:274-275).

    backend: 'pallas' (fused kernel), 'xla_banded' (shift-stack matmul),
    'xla' (per-displacement einsums, fp32 HIGHEST — the parity reference),
    'xla_scan' (same numerics as 'xla', lax.scan-serialized backward — the
    fp32-on-TPU parity mode; see displaced_joint_xla_subheads_scan),
    'auto' (pallas -> banded fallback).

    pre_padded: inputs already carry the zero spatial border of width
    ``padding`` (producer emitted padded+masked maps) — the pallas path then
    skips its pad copies entirely."""
    B, H, W, S, K = x_out.shape
    if backend == "auto":
        # pallas on TPU; banded XLA elsewhere (interpret-mode pallas is slow)
        backend = "pallas" if jax.default_backend() == "tpu" else "xla_banded"
    if backend == "pallas":
        from .pallas.mi_joint import displaced_joint_pallas

        flat = displaced_joint_pallas(
            x_out.reshape(B, H, W, S * K), x_tf_out.reshape(B, H, W, S * K),
            padding, None, jnp.bfloat16, pre_padded,
        )
        joint = _block_diagonal_subheads(flat, S, K)
    if pre_padded and backend != "pallas":
        p = padding
        x_out = x_out[:, p:H - p, p:W - p]
        x_tf_out = x_tf_out[:, p:H - p, p:W - p]
        B, H, W, S, K = x_out.shape
    if backend == "xla_banded":
        flat = displaced_joint_xla_banded(
            x_out.reshape(B, H, W, S * K), x_tf_out.reshape(B, H, W, S * K), padding
        )
        joint = _block_diagonal_subheads(flat, S, K)
    elif backend == "xla":
        joint = displaced_joint_xla_subheads(x_out, x_tf_out, padding)
    elif backend == "xla_scan":
        joint = displaced_joint_xla_subheads_scan(x_out, x_tf_out, padding)
    per_subhead = jax.vmap(lambda j: mi_from_joint(j, lamb), in_axes=2)(joint)  # [S]
    return jnp.mean(per_subhead)


def iid_segmentation_small_patch_loss_flat(
    x_out: jnp.ndarray,
    x_tf_out: jnp.ndarray,
    S: int,
    K: int,
    padding: int,
    patch_size: int,
    lamb: float = 1.0,
    backend: str = "auto",
    pre_padded: bool = False,
) -> jnp.ndarray:
    """Flat-layout ([B, H, W, S*K]) front door for the subhead displaced-MI
    loss — the TPU hot path. 5-D [.., S, K] tensors put K on the lane axis
    (padded 20 -> 128) which bloats memory ~10x; the flat layout plus
    ``group_softmax_flat`` upstream keeps everything well tiled. Falls back
    to the 5-D implementation (reshape) off the single-tile pallas path."""
    B, H, W, C = x_out.shape
    assert C >= S * K, (C, S, K)  # trailing lanes may be dead zero-padding
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla_banded"
    interior_h = H - 2 * padding if pre_padded else H
    interior_w = W - 2 * padding if pre_padded else W
    single_tile = patch_size >= interior_h and patch_size >= interior_w
    if backend == "pallas" and single_tile:
        from .pallas.mi_joint import displaced_joint_pallas

        flat = displaced_joint_pallas(
            x_out, x_tf_out, padding, None, jnp.bfloat16, pre_padded)
        joint = _block_diagonal_subheads(flat[:, :, :S * K, :S * K], S, K)
        per_subhead = jax.vmap(lambda j: mi_from_joint(j, lamb), in_axes=2)(joint)
        return jnp.mean(per_subhead)
    x_out = x_out[..., :S * K]
    x_tf_out = x_tf_out[..., :S * K]
    return iid_segmentation_small_patch_loss_subheads(
        x_out.reshape(B, H, W, S, K), x_tf_out.reshape(B, H, W, S, K),
        padding=padding, patch_size=patch_size, lamb=lamb, backend=backend,
        pre_padded=pre_padded,
    )


def iid_segmentation_loss_fused_logits(
    l1: jnp.ndarray,
    l2: jnp.ndarray,
    S: int,
    K: int,
    padding: int,
    lamb: float = 1.0,
    T: float = 1.0,
) -> jnp.ndarray:
    """Displaced-MI loss straight from PRE-PADDED lane-width LOGIT canvases
    [B, Hp, Wp, 128] — the fused Pallas path: group softmax, border masking,
    and the joint run in one kernel pass; probabilities never touch HBM
    (see ops/pallas/mi_fused.py). Semantics == group_softmax_flat + border
    mask + iid_segmentation_loss (single full-map tile, the headline
    patch_sizes=1024 config)."""
    from .pallas.mi_fused import displaced_joint_softmax_pallas

    flat = displaced_joint_softmax_pallas(l1, l2, padding, S, K, T)
    joint = _block_diagonal_subheads(flat[:, :, :S * K, :S * K], S, K)
    per_subhead = jax.vmap(lambda j: mi_from_joint(j, lamb), in_axes=2)(joint)
    return jnp.mean(per_subhead)


def _block_diagonal_subheads(flat_joint: jnp.ndarray, S: int, K: int) -> jnp.ndarray:
    """[T, T, S*K, S*K] -> per-subhead diagonal blocks [T, T, S, K, K]."""
    T = flat_joint.shape[0]
    r = flat_joint.reshape(T, T, S, K, S, K)
    return jnp.stack([r[:, :, s, :, s, :] for s in range(S)], axis=2)


def iid_segmentation_small_patch_loss_subheads(
    x_out: jnp.ndarray,
    x_tf_out: jnp.ndarray,
    padding: int,
    patch_size: int,
    lamb: float = 1.0,
    backend: str = "auto",
    pre_padded: bool = False,
) -> jnp.ndarray:
    """Tiled variant over [B, H, W, S, K]; average over tiles of the
    per-tile subhead-mean loss."""
    assert x_out.ndim == 5 and x_out.shape == x_tf_out.shape
    B, H, W, S, K = x_out.shape
    if pre_padded:
        if patch_size >= H - 2 * padding and patch_size >= W - 2 * padding:
            # degenerate single full-map tile (the headline config): the
            # pre-padded fast path applies directly
            return iid_segmentation_loss_subheads(
                x_out, x_tf_out, padding=padding, lamb=lamb, backend=backend,
                pre_padded=True,
            )
        p = padding
        x_out = x_out[:, p:H - p, p:W - p]
        x_tf_out = x_tf_out[:, p:H - p, p:W - p]
        B, H, W, S, K = x_out.shape
    ph, pw = min(patch_size, H), min(patch_size, W)
    step = max(patch_size // 2, 1)
    losses = []
    for hy in _tile_offsets(H, patch_size, step):
        for wx in _tile_offsets(W, patch_size, step):
            sl = (slice(None), slice(hy, hy + ph), slice(wx, wx + pw))
            losses.append(
                iid_segmentation_loss_subheads(
                    x_out[sl], x_tf_out[sl], padding=padding, lamb=lamb, backend=backend
                )
            )
    return sum(losses) / len(losses)


# Convenience: subhead-leading vmap form ([S, B, H, W, K]).
displaced_joint_subheads = jax.vmap(
    functools.partial(displaced_joint_xla), in_axes=(0, 0, None)
)

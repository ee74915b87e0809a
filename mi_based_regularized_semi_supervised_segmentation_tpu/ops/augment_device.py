"""Fused on-device augmentation — the TPU-native data path.

Re-expresses the reference's PIL pipeline (ACDCStrongTransforms.pretrain:
RandomRotation(45, nearest) -> random V/H flips -> RandomCrop(224) ->
brightness/contrast jitter; /root/reference/semi_seg/augment.py:7-24) as
keyed, vectorized jnp ops that run INSIDE the jitted train step on
device-resident uint8 slices. No host round-trip per batch: the whole
preprocessed dataset (~100-350 MB as uint8) lives in HBM and each step
gathers + augments its batch on device.

Geometry is applied identically to image and label (nearest-neighbor
resampling, label maps stay integral), mirroring the synchronized
SequentialWrapper semantics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rotate_nearest_batch(
    images: jnp.ndarray, angles_deg: jnp.ndarray, fill: float = 0.0
) -> jnp.ndarray:
    """[B, H, W] (any dtype) rotated per-sample by angles (degrees),
    nearest-neighbor, original canvas, zero fill — vectorized version of the
    host PairedTransform._rotate_nearest."""
    B, H, W = images.shape
    theta = jnp.deg2rad(angles_deg)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
    cos_t = jnp.cos(theta)[:, None, None]
    sin_t = jnp.sin(theta)[:, None, None]
    src_x = cos_t * xs - sin_t * ys + cx
    src_y = sin_t * xs + cos_t * ys + cy
    sx = jnp.rint(src_x).astype(jnp.int32)
    sy = jnp.rint(src_y).astype(jnp.int32)
    valid = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
    sxc = jnp.clip(sx, 0, W - 1)
    syc = jnp.clip(sy, 0, H - 1)

    def gather_one(img, yy, xx, ok):
        vals = img[yy, xx]
        return jnp.where(ok, vals, jnp.asarray(fill, vals.dtype))

    return jax.vmap(gather_one)(images, syc, sxc, valid)


def flip_batch(images: jnp.ndarray, vflip: jnp.ndarray, hflip: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W]; per-sample boolean flips of axis 1 (v) and axis 2 (h)."""
    images = jnp.where(vflip[:, None, None], jnp.flip(images, axis=1), images)
    return jnp.where(hflip[:, None, None], jnp.flip(images, axis=2), images)


def crop_batch(images: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray, crop: int) -> jnp.ndarray:
    """[B, H, W] -> [B, crop, crop] at per-sample offsets."""

    def one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x), (crop, crop))

    return jax.vmap(one)(images, ys, xs)


def _crop_offsets_in_window(
    key: jax.Array, n: int, size: jnp.ndarray, start: jnp.ndarray,
    crop: int, canvas: int,
) -> jnp.ndarray:
    """Per-sample crop offsets confined to each slice's valid window.

    size/start: [B] valid extent and canvas offset along one axis. When the
    window is at least ``crop`` wide the crop lies fully inside it (reference
    RandomCrop: never samples padding); when narrower, the crop contains the
    whole window with the residual padding randomly distributed (PIL
    pad-if-needed semantics)."""
    lo = jnp.where(size >= crop, start, start + size - crop)
    hi = jnp.where(size >= crop, start + size - crop, start)
    lo = jnp.clip(lo, 0, canvas - crop)
    hi = jnp.clip(hi, lo, canvas - crop)
    u = jax.random.uniform(key, (n,))
    off = lo + jnp.floor(u * (hi - lo + 1).astype(jnp.float32)).astype(jnp.int32)
    return jnp.clip(off, lo, hi)


def augment_pair_batch(
    key: jax.Array,
    images: jnp.ndarray,   # [B, H, W] uint8 or float
    labels: Optional[jnp.ndarray],  # [B, H, W] int or None
    crop: int = 224,
    rotation: float = 45.0,
    jitter: Optional[Tuple[float, float]] = (0.5, 1.5),
    flips: bool = True,
    valid_hw: Optional[jnp.ndarray] = None,   # [B, 2] valid (h, w) per slice
    offsets: Optional[jnp.ndarray] = None,    # [B, 2] canvas (top, left)
    geometry: str = "fused",
    packed: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Full reference-pretrain augmentation, synchronized image/label.
    Returns (image [B, crop, crop, 1] float32 in [0,~1.5], label [B, crop, crop]).

    valid_hw/offsets (from DeviceDataStore) confine random crops to each
    slice's valid window on the padded canvas — reference RandomCrop
    semantics over mixed-size slices.

    geometry selects how rotate/flip/crop execute:
    - "fused" (default): rotate ∘ flip ∘ crop compose into ONE gather
      that produces the crop²-sized output directly — bit-identical to the
      sequential path (the only rounding, rint of the rotated source, is
      the same) but gathers crop²/canvas² of the elements and skips the
      separate flip and crop passes. Gathers dominate the augmentation on
      TPU (~13 cycles/element, serialized on the core): every XLA
      roll/shear-based rotation alternative measured SLOWER than the
      single 2-D gather (3-shear via 27 static rolls+selects: 32 ms;
      per-row dynamic slices: 27 ms; one lane-axis take_along_axis shear
      alone: 16 ms — the cost of this whole gather).
    - "sequential": separate rotate-gather, flip and crop passes (the
      reference op order, parity anchor for tests).
    packed=True: ``images`` is the store's uint16 img<<8|label plane
    (DeviceDataStore(pack=True)) and ``labels`` must be None — the fused
    path gathers image AND label with ONE element gather (half the
    serialized gather cost) and unpacks the crop²-sized result.
    Bit-identical to the two-gather path: same indices, and the 0 fill
    unpacks to image 0.0 / label 0 exactly as before.

    - "shear": rotation via the in-VMEM Pallas 3-shear roll kernel
      (ops/pallas/rotate.rotate_shear_pallas_lanes) followed by cheap
      flip selects + dynamic-slice crops. A pixel PERMUTATION — exact for
      labels, distributionally equivalent but not bit-identical to
      nearest rotation (sub-pixel choices differ); opt-in
      (Kernel.geometry=shear) pending TPU compile validation."""
    B, H, W = images.shape
    if packed:
        assert labels is None and images.dtype == jnp.uint16, (
            "packed mode takes the uint16 img<<8|label canvas")
        if geometry != "fused":
            # non-fused paths rotate arithmetic values: unpack the canvas
            # upfront and run the ordinary two-tensor pipeline
            labels = (images & 0xFF).astype(jnp.uint8)
            images = (images >> 8).astype(jnp.uint8)
            packed = False
    k_rot, k_v, k_h, k_y, k_x, k_b, k_c = jax.random.split(key, 7)

    def to_float(x):
        was_uint8 = x.dtype == jnp.uint8
        x = x.astype(jnp.float32)
        return x / 255.0 if was_uint8 else x

    angles = None
    if rotation:
        angles = jax.random.uniform(k_rot, (B,), minval=-rotation, maxval=rotation)
    if flips:
        v = jax.random.bernoulli(k_v, 0.5, (B,))
        h = jax.random.bernoulli(k_h, 0.5, (B,))
        if offsets is not None:
            # flipping the canvas moves the valid window: top -> H - top - h
            top = jnp.where(v, H - offsets[:, 0] - valid_hw[:, 0], offsets[:, 0])
            left = jnp.where(h, W - offsets[:, 1] - valid_hw[:, 1], offsets[:, 1])
            offsets = jnp.stack([top, left], axis=1)
    if valid_hw is not None and offsets is not None:
        ys = _crop_offsets_in_window(k_y, B, valid_hw[:, 0], offsets[:, 0], crop, H)
        xs = _crop_offsets_in_window(k_x, B, valid_hw[:, 1], offsets[:, 1], crop, W)
    else:
        ys = jax.random.randint(k_y, (B,), 0, max(H - crop, 0) + 1)
        xs = jax.random.randint(k_x, (B,), 0, max(W - crop, 0) + 1)

    if geometry == "fused":
        # composed source coords for the crop output: crop -> flip -> rotate
        ii = jnp.arange(crop, dtype=jnp.float32)[None, :, None]  # out row
        jj = jnp.arange(crop, dtype=jnp.float32)[None, None, :]  # out col
        y1 = ys[:, None, None].astype(jnp.float32) + ii  # post-flip canvas
        x1 = xs[:, None, None].astype(jnp.float32) + jj
        if flips:
            y1 = jnp.where(v[:, None, None], (H - 1) - y1, y1)
            x1 = jnp.where(h[:, None, None], (W - 1) - x1, x1)
        if angles is not None:
            theta = jnp.deg2rad(angles)[:, None, None]
            cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
            dy, dx = y1 - cy, x1 - cx
            src_x = jnp.cos(theta) * dx - jnp.sin(theta) * dy + cx
            src_y = jnp.sin(theta) * dx + jnp.cos(theta) * dy + cy
        else:
            src_y, src_x = y1, x1
        sy = jnp.rint(src_y).astype(jnp.int32)
        sx = jnp.rint(src_x).astype(jnp.int32)
        ok = (sx >= 0) & (sx < W) & (sy >= 0) & (sy < H)
        syc = jnp.clip(sy, 0, H - 1)
        sxc = jnp.clip(sx, 0, W - 1)

        def gather_one(src, yy, xx, valid):
            vals = src[yy, xx]
            return jnp.where(valid, vals, jnp.zeros((), vals.dtype))

        # Gather the RAW store dtype (uint8, or uint16 img|label packed) and
        # cast only the crop²-sized output: the gather is the serialized hot
        # op (~13 cycles/element) and reading narrow elements cuts its HBM
        # traffic vs gathering a pre-cast f32 canvas. Bit-identical:
        # gather∘(x/255) == (gather x)/255 with a 0 fill on both sides, and
        # the packed 0 fill unpacks to image 0.0 / label 0.
        if packed:
            vals = jax.vmap(gather_one)(images, syc, sxc, ok)
            img = to_float((vals >> 8).astype(jnp.uint8))
            lab = (vals & 0xFF).astype(jnp.int32)
        else:
            img = to_float(jax.vmap(gather_one)(images, syc, sxc, ok))
            if labels is not None:
                lab = jax.vmap(gather_one)(labels, syc, sxc, ok).astype(jnp.int32)
            else:
                lab = None
    elif geometry in ("shear", "sequential"):
        img = to_float(images)
        lab = labels.astype(jnp.int32) if labels is not None else None
        # same flip+crop pipeline; only the rotation op differs
        if geometry == "shear":
            from .pallas.rotate import rotate_shear_pallas_lanes

            def rotate(x):
                if x.dtype == jnp.int32:  # labels: exact permutation via f32
                    return rotate_shear_pallas_lanes(
                        x.astype(jnp.float32), angles, max_angle=rotation
                    ).astype(jnp.int32)
                return rotate_shear_pallas_lanes(x, angles, max_angle=rotation)
        else:
            def rotate(x):
                return rotate_nearest_batch(x, angles)

        if angles is not None:
            img = rotate(img)
            if lab is not None:
                lab = rotate(lab)
        if flips:
            img = flip_batch(img, v, h)
            if lab is not None:
                lab = flip_batch(lab, v, h)
        img = crop_batch(img, ys, xs, crop)
        if lab is not None:
            lab = crop_batch(lab, ys, xs, crop)
    else:
        raise ValueError(f"unknown geometry {geometry!r}")
    if jitter is not None:
        lo, hi = jitter
        brightness = jax.random.uniform(k_b, (B, 1, 1), minval=lo, maxval=hi)
        contrast = jax.random.uniform(k_c, (B, 1, 1), minval=lo, maxval=hi)
        img = img * brightness
        mean = jnp.mean(img, axis=(1, 2), keepdims=True)
        img = jnp.clip((img - mean) * contrast + mean, 0.0, None)
    return img[..., None], lab


def center_crop_batch(images: jnp.ndarray, crop: int) -> jnp.ndarray:
    """[B, H, W] -> [B, crop, crop] center crop (eval transform)."""
    B, H, W = images.shape
    y = max((H - crop) // 2, 0)
    x = max((W - crop) // 2, 0)
    return images[:, y:y + crop, x:x + crop]

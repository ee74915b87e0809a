"""Native host pipeline (C++ PNG decode + fused augmentation) parity tests.
Skipped when the toolchain/library is unavailable."""

import io

import numpy as np
import pytest

from mi_based_regularized_semi_supervised_segmentation_tpu.data import native
from mi_based_regularized_semi_supervised_segmentation_tpu.data.augment import (
    GeometryParams,
    PairedTransform,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_png_decode_matches_pil(rng):
    from PIL import Image

    arr = (rng.random((97, 123)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="L").save(buf, format="PNG")
    dec = native.decode_png_gray8(buf.getvalue())
    np.testing.assert_array_equal(dec, arr)


def test_png_decode_rejects_rgb(rng):
    from PIL import Image

    arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="RGB").save(buf, format="PNG")
    assert native.decode_png_gray8(buf.getvalue()) is None


def test_augment_geometry_bit_exact(rng):
    t = PairedTransform(rotation=45, vflip=True, hflip=True, crop=96, jitter=None)
    img = rng.random((140, 133)).astype(np.float32)
    gt = rng.integers(0, 4, (140, 133)).astype(np.int32)
    for angle, vf, hf in ((0.0, False, False), (17.5, True, False), (-44.0, True, True)):
        p = GeometryParams(angle=angle, vflip=vf, hflip=hf, crop_y=5, crop_x=9)
        ref_img = t.apply_geometry(img, p)
        ref_gt = t.apply_geometry(gt, p).astype(np.int32)
        out_img, out_gt = native.augment_pair(img, gt, angle, vf, hf, 5, 9, 96)
        np.testing.assert_array_equal(out_img, ref_img)
        np.testing.assert_array_equal(out_gt, ref_gt)


def test_augment_pad_if_small(rng):
    # image smaller than crop: centered zero padding
    t = PairedTransform(rotation=0, vflip=False, hflip=False, crop=64, jitter=None)
    img = rng.random((40, 50)).astype(np.float32)
    p = GeometryParams(crop_y=0, crop_x=0)
    ref = t.apply_geometry(img, p)
    out_img, _ = native.augment_pair(img, None, 0.0, False, False, 0, 0, 64)
    np.testing.assert_array_equal(out_img, ref)


def test_full_transform_uses_native_and_matches_semantics(rng):
    t = PairedTransform(rotation=30, vflip=True, hflip=True, crop=64, jitter=(0.5, 1.5))
    img = rng.random((100, 100)).astype(np.float32)
    gt = rng.integers(0, 4, (100, 100))
    out_img, out_gt = t(img, gt, np.random.default_rng(5))
    assert out_img.shape == (64, 64, 1)
    assert out_gt.shape == (64, 64)
    assert out_gt.dtype == np.int32

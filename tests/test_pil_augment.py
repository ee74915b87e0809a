"""Class-based transform zoo (data/pil_augment.py) — semantics of the wheel's
pil_augment surface on numpy arrays, plus the leftover wheel meters
(IoU / Kappa / InstanceValue)."""

import numpy as np
import pytest

from mi_based_regularized_semi_supervised_segmentation_tpu.data import pil_augment as pa
from mi_based_regularized_semi_supervised_segmentation_tpu.utils import (
    InstanceValue,
    IoUMeter,
    Kappa2Annotator,
    KappaMetrics,
    cohen_kappa,
)


def test_identity_compose(rng):
    x = rng.random((8, 8)).astype(np.float32)
    assert pa.Identity()(x) is x
    out = pa.Compose([pa.Identity(), pa.ToTensor()])(x, rng=rng)
    assert out.shape == (8, 8, 1)


def test_img2tensor_grey_and_rgb(rng):
    grey = (rng.random((6, 5)) * 255).astype(np.uint8)
    out = pa.Img2Tensor()(grey)
    assert out.shape == (6, 5, 1) and out.dtype == np.float32
    assert out.max() <= 1.0

    rgb = (rng.random((6, 5, 3)) * 255).astype(np.uint8)
    g = pa.Img2Tensor(include_grey=True, include_rgb=False)(rgb)
    assert g.shape == (6, 5, 1)
    both = pa.Img2Tensor(include_grey=True, include_rgb=True)(rgb)
    assert both.shape == (6, 5, 4)
    np.testing.assert_allclose(both[..., 0], g[..., 0])
    only_rgb = pa.Img2Tensor(include_grey=False, include_rgb=True)(rgb)
    assert only_rgb.shape == (6, 5, 3)
    with pytest.raises(AssertionError):
        pa.Img2Tensor(include_grey=False, include_rgb=True)(grey)


def test_cutout_zeroes_a_box(rng):
    x = np.ones((32, 32), np.float32)
    out = pa.PILCutout(4, 8, pad_value=0)(x, rng=rng)
    assert out.min() == 0.0 and x.min() == 1.0  # input untouched
    n_zero = int((out == 0).sum())
    assert 2 * 2 <= n_zero <= 8 * 8


def test_random_crop_shapes_and_padding(rng):
    x = rng.random((20, 24)).astype(np.float32)
    out = pa.RandomCrop(16)(x, rng=rng)
    assert out.shape == (16, 16)
    # crop content must be a window of the source
    found = any(
        np.array_equal(x[i:i + 16, j:j + 16], out)
        for i in range(5) for j in range(9))
    assert found
    # pad_if_needed grows small inputs
    small = rng.random((8, 8)).astype(np.float32)
    out = pa.RandomCrop(12, pad_if_needed=True, fill=0)(small, rng=rng)
    assert out.shape == (12, 12)
    # explicit pre-pad, edge mode
    out = pa.RandomCrop(20, padding=2, padding_mode="edge")(x, rng=rng)
    assert out.shape == (20, 20)


def test_center_crop_matches_manual(rng):
    x = rng.random((21, 17)).astype(np.float32)
    out = pa.CenterCrop((11, 9))(x)
    np.testing.assert_array_equal(out, x[5:16, 4:13])


def test_resize_smaller_edge_semantics(rng):
    x = rng.random((10, 20)).astype(np.float32)
    out = pa.Resize(5)(x)  # smaller edge (h) -> 5, w scales to 10
    assert out.shape == (5, 10)
    out = pa.Resize((7, 9), interpolation="nearest")(x)
    assert out.shape == (7, 9)
    labels = rng.integers(0, 4, (10, 20))
    out = pa.Resize((5, 10), interpolation="nearest")(labels)
    assert set(np.unique(out)) <= set(np.unique(labels))


def test_random_rotation_bounds(rng):
    x = rng.random((16, 16)).astype(np.float32)
    out = pa.RandomRotation(45)(x, rng=rng)
    assert out.shape == x.shape
    with pytest.raises(ValueError):
        pa.RandomRotation(-10)
    with pytest.raises(NotImplementedError):
        pa.RandomRotation(10, expand=True)
    # zero-degree range is the identity
    np.testing.assert_array_equal(pa.RandomRotation((0, 0))(x, rng=rng), x)


def test_flips(rng):
    x = rng.random((6, 5)).astype(np.float32)
    np.testing.assert_array_equal(
        pa.RandomHorizontalFlip(p=1.0)(x, rng=rng), x[:, ::-1])
    np.testing.assert_array_equal(
        pa.RandomVerticalFlip(p=1.0)(x, rng=rng), x[::-1])
    assert pa.RandomHorizontalFlip(p=0.0)(x, rng=rng) is x


def test_sobel_process_channels(rng):
    x = rng.random((9, 9)).astype(np.float32)
    out = pa.SobelProcess()(x)
    assert out.shape == (9, 9, 2)  # dx, dy — NOT magnitude (wheel semantics)
    out = pa.SobelProcess(include_origin=True)(x)
    assert out.shape == (9, 9, 3)
    # dx of a unit horizontal ramp: kernel row-sum 4 x central diff -2 = -8
    ramp = np.tile(np.arange(9, dtype=np.float32), (9, 1))
    dx = pa.SobelProcess()(ramp)[..., 0]
    assert np.allclose(dx[2:-2, 2:-2], -8.0)


def test_random_apply_choice_lists(rng):
    x = np.zeros((4, 4), np.float32)
    add1 = lambda a: a + 1
    add2 = lambda a: a + 2
    out = pa.RandomApplyList([add1, add2], p=1.0)(x, rng=rng)
    np.testing.assert_array_equal(out, x + 3)
    out = pa.RandomApplyList([add1], p=0.0)(x, rng=rng)
    assert out is x
    out = pa.RandomChoiceList([add1, add2])(x, rng=rng)
    assert float(out[0, 0]) in (1.0, 2.0)


def test_to_tensor_to_label():
    u8 = (np.arange(12, dtype=np.uint8) * 20).reshape(3, 4)
    t = pa.ToTensor()(u8)
    assert t.dtype == np.float32 and t.shape == (3, 4, 1) and t.max() <= 1.0
    lab = pa.ToLabel()(u8 // 20)
    assert lab.dtype == np.int64
    mapped = pa.ToLabel(mapping={0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2,
                                 6: 3, 7: 3, 8: 3, 9: 3, 10: 3, 11: 3})(u8 // 20)
    assert set(np.unique(mapped)) <= {0, 1, 2, 3}


# ---------------------------------------------------------------------------
# leftover wheel meters
# ---------------------------------------------------------------------------

def test_iou_meter_perfect_and_known():
    m = IoUMeter(num_classes=3, report_axis=[1, 2])
    pred = np.array([[[0, 1], [2, 1]]])
    m.add(pred, pred)
    v = m.value()
    assert v["Overall_Acc"] == 1.0
    np.testing.assert_allclose(v["Class_IoU"], 1.0, atol=1e-6)
    assert set(m.summary()) == {"1", "2"}

    m.reset()
    # one class-1 pixel predicted as 2: IoU1 = 1/2, IoU2 = 1/2 (fp), IoU0 = 1
    tgt = np.array([[[0, 1], [1, 0]]])
    prd = np.array([[[0, 1], [2, 0]]])
    m.add(prd, tgt)
    v = m.value()
    np.testing.assert_allclose(v["Class_IoU"], [1.0, 0.5, 0.0], atol=1e-6)
    # class 2 never appears in gt -> excluded from Validated_Mean_IoU
    np.testing.assert_allclose(v["Validated_Mean_IoU"], 0.75, atol=1e-6)
    # scores input: argmax over axis 1
    scores = np.zeros((1, 3, 2, 2), np.float32)
    for c in range(3):
        scores[0, c] = (prd[0] == c)
    m2 = IoUMeter(num_classes=3)
    m2.add(scores, tgt)
    np.testing.assert_allclose(m2.value()["Class_IoU"], v["Class_IoU"])


def test_cohen_kappa_reference_values():
    # perfect agreement
    assert cohen_kappa([0, 1, 2, 0], [0, 1, 2, 0]) == 1.0
    # 2x2 example: po=0.7, marginals 40/60 both -> pe=0.52, kappa=0.375
    y1 = [1] * 25 + [1] * 15 + [0] * 15 + [0] * 45
    y2 = [1] * 25 + [0] * 15 + [1] * 15 + [0] * 45
    np.testing.assert_allclose(cohen_kappa(y1, y2), 0.375, atol=1e-9)


def test_kappa_meters():
    m = KappaMetrics()
    tgt = np.array([1, 1, 2, 2, 3, 0])
    m.add([tgt.copy(), np.array([1, 2, 2, 2, 3, 0])], tgt,
          considered_classes=[1, 2, 3])
    s = m.summary()
    assert s["kappa0"] == 1.0 and 0 < s["kappa1"] < 1.0

    m2 = Kappa2Annotator()
    m2.add(tgt, tgt, gt=tgt, considered_classes=[1, 2, 3])
    assert m2.summary()["kappa"] == 1.0


def test_instance_value():
    m = InstanceValue()
    m.add(42)
    assert m.value() == 42 and m.summary() == {"value": 42}
    m.reset()
    assert m.value() is None

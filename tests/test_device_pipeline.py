"""Device-resident data pipeline + fused on-device augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
    ACDCDataset,
    generate_synthetic_acdc,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.data.augment import (
    _rotate_nearest,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.data.device_pipeline import (
    DeviceDataStore,
    DeviceIndexLoader,
    DevicePatientEvalLoader,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
    build_optimizer,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import (
    init_train_state,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
    build_eval_step,
    build_train_step,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.models import UNet
from mi_based_regularized_semi_supervised_segmentation_tpu.ops.augment_device import (
    augment_pair_batch,
    center_crop_batch,
    crop_batch,
    flip_batch,
    rotate_nearest_batch,
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("acdc_dev")
    generate_synthetic_acdc(str(root), num_train_patients=4, num_val_patients=2,
                            slices_per_patient=4, size=64)
    return str(root)


def test_rotate_device_matches_host(rng):
    img = rng.random((2, 17, 19)).astype(np.float32)
    angles = np.array([33.0, -71.0], np.float32)
    got = np.asarray(rotate_nearest_batch(jnp.asarray(img), jnp.asarray(angles)))
    for b in range(2):
        expect = _rotate_nearest(img[b], angles[b])
        # rounding ties at .5 can differ between np.rint paths; allow tiny count
        mismatch = np.sum(got[b] != expect)
        assert mismatch <= img[b].size * 0.02, mismatch


def test_flip_crop_center(rng):
    x = jnp.asarray(rng.random((2, 8, 8)), jnp.float32)
    flipped = flip_batch(x, jnp.asarray([True, False]), jnp.asarray([False, True]))
    np.testing.assert_array_equal(np.asarray(flipped[0]), np.asarray(x[0])[::-1])
    np.testing.assert_array_equal(np.asarray(flipped[1]), np.asarray(x[1])[:, ::-1])
    cropped = crop_batch(x, jnp.asarray([1, 2]), jnp.asarray([3, 0]), 4)
    np.testing.assert_array_equal(np.asarray(cropped[0]), np.asarray(x[0])[1:5, 3:7])
    cc = center_crop_batch(x, 4)
    np.testing.assert_array_equal(np.asarray(cc[0]), np.asarray(x[0])[2:6, 2:6])


def test_augment_pair_batch_sync(rng):
    img = (rng.random((3, 64, 64)) * 255).astype(np.uint8)
    lab = rng.integers(0, 3, (3, 64, 64)).astype(np.uint8)
    out_img, out_lab = augment_pair_batch(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(lab), crop=32)
    assert out_img.shape == (3, 32, 32, 1)
    assert out_lab.shape == (3, 32, 32)
    assert out_lab.dtype == jnp.int32
    assert set(np.unique(np.asarray(out_lab))) <= {0, 1, 2}
    # deterministic per key
    out_img2, _ = augment_pair_batch(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(lab), crop=32)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(out_img2))


def test_crop_confined_to_valid_window(rng):
    """Mixed-size slices on a padded canvas: random crops never contain
    canvas padding when the slice is big enough (reference RandomCrop), and
    contain the WHOLE slice when it is smaller than the crop (pad-if-needed)."""
    B, H, W, crop = 6, 96, 96, 32
    sizes = [(96, 96), (64, 40), (40, 64), (33, 33), (20, 80), (16, 16)]
    img = np.zeros((B, H, W), np.uint8)
    valid_hw = np.zeros((B, 2), np.int32)
    offsets = np.zeros((B, 2), np.int32)
    for i, (h, w) in enumerate(sizes):
        top, left = (H - h) // 2, (W - w) // 2
        img[i, top:top + h, left:left + w] = 255  # valid pixels = 255, pad = 0
        valid_hw[i] = (h, w)
        offsets[i] = (top, left)
    for seed in range(8):
        out, _ = augment_pair_batch(
            jax.random.PRNGKey(seed), jnp.asarray(img), None, crop=crop,
            rotation=0.0, jitter=None, flips=True,
            valid_hw=jnp.asarray(valid_hw), offsets=jnp.asarray(offsets),
        )
        out = np.asarray(out[..., 0])
        for i, (h, w) in enumerate(sizes):
            n_valid = int(np.sum(out[i] == 1.0))
            if h >= crop and w >= crop:
                assert n_valid == crop * crop, (seed, i, n_valid)
            else:
                # crop contains the full valid region (+ unavoidable padding)
                assert n_valid == min(h, crop) * min(w, crop), (seed, i, n_valid)


def test_device_store_stages_valid_windows(data_root):
    ds = ACDCDataset(data_root, "train")
    store = DeviceDataStore(ds)
    np.testing.assert_array_equal(np.asarray(store.valid_hw_dev), store.valid_hw)
    np.testing.assert_array_equal(np.asarray(store.offsets_dev), store.offsets)


def test_device_store_and_loaders(data_root):
    ds = ACDCDataset(data_root, "train")
    store = DeviceDataStore(ds)
    assert len(store) == 16
    assert store.images.dtype == jnp.uint8
    loader = DeviceIndexLoader(store, batch_size=3, seed=0)
    b = next(iter(loader))
    assert b["indices"].shape == (3,)
    assert len(b["group"]) == 3
    ev = DevicePatientEvalLoader(store)
    batches = list(ev)
    assert len(batches) == 4
    assert batches[0]["mask"].sum() == 4


def test_device_data_train_and_eval_step(data_root):
    ds = ACDCDataset(data_root, "train")
    store = DeviceDataStore(ds)
    model = UNet(input_dim=1, num_classes=4)
    tx = build_optimizer({"name": "Adam", "lr": 1e-3})
    state = init_train_state(model, tx, (1, 32, 32, 1), seed=0)
    step = build_train_step(
        model, tx, "partial", num_classes=4,
        data_store={"labeled": store, "unlabeled": store}, crop=32)
    batch = {"labeled_indices": jnp.asarray([0, 1], jnp.int32),
             "unlabeled_indices": jnp.asarray([2, 3, 4], jnp.int32)}
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["sup_loss"]))
    ev = build_eval_step(model, num_classes=4, data_store=store, crop=32)
    out = ev(state2.params, state2.batch_stats,
             jnp.asarray([0, 1, 2, 3], jnp.int32),
             jnp.asarray([True, True, True, False]))
    assert np.isfinite(float(out["loss"]))
    assert out["inter"].shape == (1, 4)


def test_fused_geometry_matches_sequential(rng):
    """The composed rotate∘flip∘crop single-gather path is bit-identical to
    the sequential rotate -> flip -> crop path (same key stream, same rint)."""
    import jax
    import jax.numpy as jnp

    B, H, W, crop = 5, 64, 64, 48
    imgs = rng.integers(0, 256, (B, H, W)).astype(np.uint8)
    labs = rng.integers(0, 4, (B, H, W)).astype(np.uint8)
    valid_hw = np.tile(np.array([[H, W]], np.int32), (B, 1))
    valid_hw[0] = (40, 30)  # one narrow slice exercises the window logic
    offsets = np.zeros((B, 2), np.int32)
    offsets[0] = (10, 20)
    key = jax.random.PRNGKey(7)
    kwargs = dict(crop=crop, valid_hw=jnp.asarray(valid_hw),
                  offsets=jnp.asarray(offsets))
    img_f, lab_f = augment_pair_batch(key, jnp.asarray(imgs), jnp.asarray(labs),
                                      geometry="fused", **kwargs)
    img_s, lab_s = augment_pair_batch(key, jnp.asarray(imgs), jnp.asarray(labs),
                                      geometry="sequential", **kwargs)
    np.testing.assert_array_equal(np.asarray(img_f), np.asarray(img_s))
    np.testing.assert_array_equal(np.asarray(lab_f), np.asarray(lab_s))


def test_packed_gather_bit_identical(rng):
    """packed=True (uint16 img<<8|label single gather) is bit-identical to
    the two-gather fused path for the same key, including the 0 fill and the
    narrow-window crop logic; non-fused geometries unpack upfront and match
    their unpacked counterparts too."""
    import jax
    import jax.numpy as jnp

    B, H, W, crop = 5, 64, 64, 48
    imgs = rng.integers(0, 256, (B, H, W)).astype(np.uint8)
    labs = rng.integers(0, 4, (B, H, W)).astype(np.uint8)
    packed = (imgs.astype(np.uint16) << 8) | labs
    valid_hw = np.tile(np.array([[H, W]], np.int32), (B, 1))
    valid_hw[0] = (40, 30)
    offsets = np.zeros((B, 2), np.int32)
    offsets[0] = (10, 20)
    key = jax.random.PRNGKey(7)
    kwargs = dict(crop=crop, valid_hw=jnp.asarray(valid_hw),
                  offsets=jnp.asarray(offsets))
    for geometry in ("fused", "sequential"):
        img_u, lab_u = augment_pair_batch(
            key, jnp.asarray(imgs), jnp.asarray(labs),
            geometry=geometry, **kwargs)
        img_p, lab_p = augment_pair_batch(
            key, jnp.asarray(packed), None,
            geometry=geometry, packed=True, **kwargs)
        np.testing.assert_array_equal(np.asarray(img_u), np.asarray(img_p))
        np.testing.assert_array_equal(np.asarray(lab_u), np.asarray(lab_p))


def test_packed_store_roundtrip(data_root):
    """DeviceDataStore(pack=True) stages the uint16 plane consistent with
    its images/labels arrays."""
    from mi_based_regularized_semi_supervised_segmentation_tpu.data import ACDCDataset
    from mi_based_regularized_semi_supervised_segmentation_tpu.data.device_pipeline import (
        DeviceDataStore,
    )

    store = DeviceDataStore(ACDCDataset(data_root, "train"), pack=True)
    packed = np.asarray(store.packed)
    np.testing.assert_array_equal(packed >> 8, np.asarray(store.images))
    np.testing.assert_array_equal(packed & 0xFF, np.asarray(store.labels))


def test_shear_geometry_close_to_sequential(rng):
    """geometry="shear" (Pallas 3-shear rotation, interpret mode on CPU):
    same shapes/dtypes, labels stay integral in-range, and the result is
    pixelwise close to the exact-rotation sequential path (the shear
    permutation differs only in sub-pixel resampling choices)."""
    import jax
    import jax.numpy as jnp

    B, H, W, crop = 2, 64, 64, 48
    yy, xx = np.mgrid[0:H, 0:W]
    imgs = (((yy // 8) + (xx // 8)) % 2 * 200 + 20).astype(np.uint8)
    imgs = np.tile(imgs[None], (B, 1, 1))
    labs = (yy[None] // 16 % 4).astype(np.uint8).repeat(B, axis=0)
    key = jax.random.PRNGKey(3)
    kwargs = dict(crop=crop, jitter=None)
    img_p, lab_p = augment_pair_batch(key, jnp.asarray(imgs), jnp.asarray(labs),
                                      geometry="shear", **kwargs)
    img_s, lab_s = augment_pair_batch(key, jnp.asarray(imgs), jnp.asarray(labs),
                                      geometry="sequential", **kwargs)
    assert img_p.shape == img_s.shape and lab_p.shape == lab_s.shape
    lab_np = np.asarray(lab_p)
    assert lab_np.dtype == np.int32
    assert set(np.unique(lab_np)) <= set(range(4))
    agree = np.mean(np.asarray(img_p) == np.asarray(img_s))
    assert agree > 0.9, agree

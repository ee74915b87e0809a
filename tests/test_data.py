import numpy as np
import pytest

from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
    ACDCDataset,
    ACDCSemiInterface,
    ACDCStrongTransforms,
    InfiniteRandomSampler,
    PatientEvalLoader,
    PatientSampler,
    SegmentationLoader,
    create_val_loader,
    create_val_split,
    generate_synthetic_acdc,
    get_dataloaders,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.data.augment import (
    PairedTransform,
    _rotate_nearest,
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("acdc")
    generate_synthetic_acdc(str(root), num_train_patients=8, num_val_patients=3,
                            slices_per_patient=6, size=256)
    return str(root)


def test_dataset_scan_and_metadata(data_root):
    ds = ACDCDataset(data_root, "train")
    assert len(ds) == 8 * 6
    assert len(ds.get_group_list()) == 8
    img, gt, stem = ds.load_raw(0)
    assert img.shape == (256, 256) and img.dtype == np.float32
    assert 0 <= img.min() and img.max() <= 1.0
    assert gt.shape == (256, 256) and set(np.unique(gt)) <= {0, 1, 2, 3}
    assert ds.get_group(stem).startswith("patient")
    assert ds.get_partition(stem) in ("0", "1", "2")


def test_partition_thirds(data_root):
    ds = ACDCDataset(data_root, "train")
    partitions = [ds.get_partition(s) for s in ds.stems]
    # 6 slices, cutting=2: idx 0-1 -> "0", 2-4 -> "1", 5 -> "2"
    per_patient = partitions[:6]
    assert per_patient == ["0", "0", "1", "1", "1", "2"]


def test_semi_split_patient_level_deterministic(data_root):
    iface = ACDCSemiInterface(data_root, 0.25, 0.75)
    lab, unlab, test = iface.create_semi_supervised_datasets()
    assert len(lab) + len(unlab) == 48
    assert lab.show_group_set().isdisjoint(unlab.show_group_set())
    assert len(lab.show_group_set()) == 2  # 25% of 8 patients
    # deterministic across constructions
    lab2, unlab2, _ = ACDCSemiInterface(data_root, 0.25, 0.75).create_semi_supervised_datasets()
    assert lab.stems == lab2.stems


def test_full_supervision_shortcircuit(data_root):
    iface = ACDCSemiInterface(data_root, 1.0, 0.0)
    lab, unlab, _ = iface.create_semi_supervised_datasets()
    assert len(lab) == len(unlab) == 48


def test_val_carve_deterministic(data_root):
    iface = ACDCSemiInterface(data_root, 0.25, 0.75)
    _, unlab, _ = iface.create_semi_supervised_datasets()
    val1 = create_val_split(unlab, num_patients=2)
    val2 = create_val_split(unlab, num_patients=2)
    assert val1.stems == val2.stems
    assert len(val1.show_group_set()) == 2
    assert val1.show_group_set() <= unlab.show_group_set()


def test_rotate_nearest_identity_and_90(rng):
    arr = rng.normal(size=(9, 9)).astype(np.float32)
    np.testing.assert_array_equal(_rotate_nearest(arr, 0), arr)
    r90 = _rotate_nearest(arr, 90)
    # 90-degree rotation of a square array is exact (array-axes rot90(+1))
    np.testing.assert_allclose(r90, np.rot90(arr, 1), atol=1e-6)


def test_paired_transform_sync_geometry(data_root):
    ds = ACDCDataset(data_root, "train")
    img, gt, _ = ds.load_raw(0)
    t = PairedTransform(rotation=45, vflip=True, hflip=True, crop=224, jitter=(0.5, 1.5))
    out_img, out_tgt = t(img, gt, np.random.default_rng(3))
    assert out_img.shape == (224, 224, 1)
    assert out_tgt.shape == (224, 224)
    # geometry synchronized: fg of target overlaps bright area of image
    fg = out_tgt > 0
    if fg.sum() > 10:
        assert out_img[..., 0][fg].mean() > out_img[..., 0][~fg].mean()
    # determinism with same rng seed
    out_img2, out_tgt2 = t(img, gt, np.random.default_rng(3))
    np.testing.assert_array_equal(out_img, out_img2)
    np.testing.assert_array_equal(out_tgt, out_tgt2)


def test_center_crop_val_transform(data_root):
    ds = ACDCDataset(data_root, "val")
    img, gt, _ = ds.load_raw(0)
    out_img, out_tgt = ACDCStrongTransforms.val(img, gt, np.random.default_rng(0))
    # center crop of 256 -> 224: offset 16
    np.testing.assert_allclose(out_img[..., 0], img[16:240, 16:240], atol=1e-6)
    np.testing.assert_array_equal(out_tgt, gt[16:240, 16:240])


def test_infinite_sampler_covers_all():
    s = InfiniteRandomSampler(10, shuffle=True, seed=0)
    it = iter(s)
    first20 = [next(it) for _ in range(20)]
    assert sorted(first20[:10]) == list(range(10))
    assert sorted(first20[10:]) == list(range(10))


def test_patient_sampler_groups(data_root):
    ds = ACDCDataset(data_root, "val")
    ps = PatientSampler(ds.stems, ds.get_group)
    batches = list(ps)
    assert len(batches) == 3
    for batch in batches:
        groups = {ds.get_group(ds.stems[i]) for i in batch}
        assert len(groups) == 1
        assert len(batch) == 6


def test_segmentation_loader_batches(data_root):
    ds = ACDCDataset(data_root, "train")
    loader = SegmentationLoader(ds, ACDCStrongTransforms.pretrain, batch_size=4,
                                seed=7, num_workers=2)
    it = iter(loader)
    b1 = next(it)
    assert b1["image"].shape == (4, 224, 224, 1)
    assert b1["target"].shape == (4, 224, 224)
    assert len(b1["group"]) == 4
    b2 = next(it)
    assert not np.array_equal(b1["image"], b2["image"])


def test_patient_eval_loader_padding(data_root):
    ds = ACDCDataset(data_root, "val")
    loader = PatientEvalLoader(ds, ACDCStrongTransforms.val)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (loader.padded_size, 224, 224, 1)
        assert b["mask"].sum() == 6
        assert not b["mask"][6:].any()
        # padded region zeroed
        assert np.all(b["image"][6:] == 0)


def test_get_dataloaders_surface(data_root):
    config = {
        "RandomSeed": 10,
        "Data": {"name": "acdc", "labeled_data_ratio": 0.25, "unlabeled_data_ratio": 0.75},
        "LabeledData": {"shuffle": True, "batch_size": 2, "num_workers": 0},
        "UnlabeledData": {"shuffle": True, "batch_size": 3, "num_workers": 0},
    }
    lab, unlab, test = get_dataloaders(config, data_root=data_root)
    val = create_val_loader(unlab, test)
    assert next(iter(lab))["image"].shape == (2, 224, 224, 1)
    assert next(iter(unlab))["image"].shape == (3, 224, 224, 1)
    assert len(val) == 5  # 5 val patients carved from the 6 unlabeled patients


def test_transform_zoo_members(rng):
    """Functional zoo: resize / sobel / noise / RandomApply / RandomChoice
    (pil_augment + tensor_augment remaining members)."""
    from mi_based_regularized_semi_supervised_segmentation_tpu.data.augment import (
        Identity,
        RandomApply,
        RandomChoice,
        gaussian_noise,
        resize,
        sobel,
    )

    img = rng.random((17, 23)).astype(np.float32)
    lab = rng.integers(0, 4, (17, 23))

    r = resize(img, (8, 8))
    assert r.shape == (8, 8) and np.isfinite(r).all()
    rn = resize(lab, (8, 8), order="nearest")
    assert set(np.unique(rn)) <= set(np.unique(lab))  # labels stay integral
    # identity-size resize reproduces the input
    np.testing.assert_allclose(resize(img, (17, 23)), img, atol=1e-6)

    flat = sobel(np.ones((9, 9), np.float32))
    assert np.allclose(flat, 0)  # constant image has zero gradient
    edge = np.zeros((9, 9), np.float32)
    edge[:, 5:] = 1.0
    assert sobel(edge).max() > 0

    noisy = gaussian_noise(img, np.random.default_rng(0), std=0.1)
    assert noisy.shape == img.shape and not np.allclose(noisy, img)

    assert Identity()(img) is img
    always = RandomApply(lambda a: a + 1, p=1.0)
    never = RandomApply(lambda a: a + 1, p=0.0)
    np.testing.assert_allclose(always(img, rng), img + 1)
    np.testing.assert_allclose(never(img, rng), img)
    choice = RandomChoice([lambda a: a * 0, lambda a: a * 0])
    assert choice(img, rng).sum() == 0


def test_synthetic_v3_fixture(tmp_path):
    """v3 headroom fixture: intensity ordering randomized per patient while
    the class-diagnostic v2 texture stays on (VERDICT r4 item 9)."""
    import numpy as np
    from PIL import Image

    from mi_based_regularized_semi_supervised_segmentation_tpu.data.synthetic import (
        generate_synthetic_acdc,
    )

    root = tmp_path / "v3"
    generate_synthetic_acdc(str(root), num_train_patients=6, num_val_patients=1,
                            slices_per_patient=2, size=64, v3=True, seed=0)
    base = root / "ACDC_contrast" / "train"
    # per-patient mean intensity of ring vs cavity should flip ordering for
    # some patients (randomized ordering) — gather signs across patients
    signs = []
    for pid in range(1, 7):
        stem = f"patient{pid:03d}_01_00"
        img = np.asarray(Image.open(base / "img" / f"{stem}.png"), np.float32)
        gt = np.asarray(Image.open(base / "gt" / f"{stem}.png"))
        if (gt == 2).sum() and (gt == 3).sum():
            signs.append(np.sign(img[gt == 2].mean() - img[gt == 3].mean()))
    assert len(set(signs)) > 1, f"ordering never flips: {signs}"

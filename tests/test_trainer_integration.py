"""Trainer-loop integration at tiny shapes (CPU): config wiring, epoch loop,
checkpointing, resume, device-data + epoch-scan path."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full loops; deselect with -m 'not slow'

from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
    ACDCStrongTransforms,
    PatientEvalLoader,
    SegmentationLoader,
    create_val_split,
    generate_synthetic_acdc,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.data.acdc import (
    ACDCSemiInterface,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.data.augment import (
    PairedTransform,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine import trainer_zoos


CROP = 32


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("acdc_ti")
    generate_synthetic_acdc(str(root), num_train_patients=6, num_val_patients=2,
                            slices_per_patient=4, size=64)
    tf_train = PairedTransform(rotation=45, vflip=True, hflip=True, crop=CROP,
                               jitter=(0.5, 1.5))
    tf_val = PairedTransform(rotation=0, vflip=False, hflip=False, crop=CROP,
                             center_crop=True, jitter=None)
    iface = ACDCSemiInterface(str(root), 0.5, 0.5)
    lab, unlab, test = iface.create_semi_supervised_datasets()
    loaders = dict(
        labeled_loader=SegmentationLoader(lab, tf_train, 2, seed=0, num_workers=0),
        unlabeled_loader=SegmentationLoader(unlab, tf_train, 3, seed=1, num_workers=0),
        val_loader=PatientEvalLoader(create_val_split(unlab, 2), tf_val),
        test_loader=PatientEvalLoader(test, tf_val),
    )
    return root, loaders


def _config(mode, run_dir, **overrides):
    cfg = {
        "RandomSeed": 7,
        "Arch": {"input_dim": 1, "num_classes": 4},
        "Optim": {"name": "Adam", "lr": 1e-3, "weight_decay": 1e-5},
        "Scheduler": {"multiplier": 2, "warmup_max": 1},
        "Trainer": {"feature_names": ["Conv5", "Up_conv3", "Up_conv2"],
                    "feature_importance": [1, 0.5, 0.5], "name": mode,
                    "num_batches": 2, "max_epoch": 2},
        "UDARegCriterion": {"name": "mse", "weight": 5.0},
        "IICRegParameters": {
            "EncoderParams": {"num_clusters": 5, "num_subheads": 2},
            "DecoderParams": {"num_clusters": 5, "num_subheads": 2},
            "LossParams": {"paddings": [1, 1], "patch_sizes": 1024},
            "weight": 0.1,
        },
    }
    cfg.update(overrides)
    return cfg


def test_partial_trainer_full_loop(setup, tmp_path):
    root, loaders = setup
    Trainer = trainer_zoos["partial"]
    t = Trainer(configuration=_config("partial", tmp_path), save_dir="t_partial",
                max_epoch=2, num_batches=2, crop_size=CROP,
                run_dir=str(tmp_path), **loaders)
    t.init()
    best = t.start_training()
    assert np.isfinite(best) and 0 <= best <= 1
    assert (tmp_path / "t_partial" / "last.ckpt").exists()
    assert (tmp_path / "t_partial" / "best.ckpt").exists()
    assert (tmp_path / "t_partial" / "storage.csv").exists()
    import pandas as pd
    df = pd.read_csv(tmp_path / "t_partial" / "storage.csv")
    assert list(df["epoch"]) == [0, 1]
    assert "val_dice_DSC_mean" in df.columns

    # resume: continues from epoch 2
    t2 = Trainer(configuration=_config("partial", tmp_path), save_dir="t_partial",
                 max_epoch=3, num_batches=2, crop_size=CROP,
                 run_dir=str(tmp_path), **loaders)
    t2.init()
    t2.load_state_dict_from_path(str(tmp_path / "t_partial"), strict=True)
    assert t2._start_epoch == 2
    t2.start_training()
    df2 = pd.read_csv(tmp_path / "t_partial" / "storage.csv")
    assert list(df2["epoch"]) == [0, 1, 2]


def test_udaiic_trainer_device_data_scan(setup, tmp_path):
    root, loaders = setup
    Trainer = trainer_zoos["udaiic"]
    cfg = _config("udaiic", tmp_path)
    cfg["Trainer"]["device_data"] = True
    t = Trainer(configuration=cfg, save_dir="t_udaiic", max_epoch=1,
                num_batches=2, crop_size=CROP, run_dir=str(tmp_path), **loaders)
    t.init()
    assert t._epoch_scan
    best = t.start_training()
    assert np.isfinite(best)
    import pandas as pd
    df = pd.read_csv(tmp_path / "t_udaiic" / "storage.csv")
    assert "tra_mi_mean" in df.columns
    assert "tra_uda_mean" in df.columns
    assert np.isfinite(df["tra_mi_mean"].iloc[0])


def test_trainer_padded_mesh_full_loop(setup, tmp_path):
    """Trainer-level pad-and-mask: the flagship-SHAPED indivisible batch
    (3 labeled + 5 unlabeled on an 8-device mesh) pads to 8+8, runs the
    device-data chunked scan actually partitioned, and completes an epoch
    with finite metrics + artifacts."""
    from mi_based_regularized_semi_supervised_segmentation_tpu.parallel import (
        make_mesh,
    )

    root, loaders = setup
    cfg = _config("uda", tmp_path)
    cfg["LabeledData"] = {"batch_size": 3}
    cfg["UnlabeledData"] = {"batch_size": 5}
    cfg["Trainer"].update(device_data=True, epoch_scan=True, scan_chunk=1,
                          progress=False)
    Trainer = trainer_zoos["uda"]
    t = Trainer(configuration=cfg, save_dir="t_padded", max_epoch=1,
                num_batches=2, crop_size=CROP, run_dir=str(tmp_path),
                mesh=make_mesh(8), **loaders)
    t.init()
    assert t._batch_padded
    assert (t._lab_bs_padded, t._unlab_bs_padded) == (8, 8)
    best = t.start_training()
    assert np.isfinite(best) and 0 <= best <= 1
    assert (tmp_path / "t_padded" / "storage.csv").exists()


def test_inference_end_to_end(setup, tmp_path):
    """The one user-facing path previously untested (VERDICT r3 item 4):
    train -> save best -> trainer.inference() -> PNG exports per test case
    + Hausdorff report keys + DSC_mean consistent with the eval path
    (reference: semi_seg/epocher.py:76-107 + trainer.py:109-125)."""
    root, loaders = setup
    Trainer = trainer_zoos["partial"]
    t = Trainer(configuration=_config("partial", tmp_path), save_dir="t_inf",
                max_epoch=1, num_batches=2, crop_size=CROP,
                run_dir=str(tmp_path), **loaders)
    t.init()
    t.start_training()

    report, score = t.inference()

    # report surface: dice + hausdorff per reported class + means
    assert np.isfinite(score) and 0 <= score <= 1
    assert report["dice"]["DSC_mean"] == score
    assert any(k.startswith("HD") or k.endswith("_mean") for k in report["hd"]), report["hd"]

    # PNG dumps: img/gt/pred per test-loader case
    save_dir = tmp_path / "t_inf"
    test_files = set()
    for batch in loaders["test_loader"]:
        n_valid = int(np.sum(batch["mask"]))
        test_files.update(batch["filename"][:n_valid])
    assert test_files
    for sub in ("img", "gt", "pred"):
        got = {p.stem for p in (save_dir / sub).glob("*.png")}
        assert test_files <= got, (sub, test_files - got)

    # inference() loaded BEST into the live state; the eval path over the
    # same test loader must agree on DSC_mean
    eval_report, eval_score = t._eval_epoch(loaders["test_loader"])
    assert np.isclose(eval_score, score, atol=1e-6), (eval_score, score)


def test_inference_device_data_fast_path(setup, tmp_path):
    """With Trainer.device_data, inference() forwards from the HBM store via
    the already-compiled patient eval step (indices up / preds down only) and
    must produce the same report surface + PNG dumps as the host path."""
    root, loaders = setup
    cfg = _config("partial", tmp_path)
    cfg["Trainer"]["device_data"] = True
    t = trainer_zoos["partial"](
        configuration=cfg, save_dir="t_inf_dev", max_epoch=1, num_batches=2,
        crop_size=CROP, run_dir=str(tmp_path), **loaders)
    t.init()
    t.start_training()
    report, score = t.inference()
    assert np.isfinite(score) and 0 <= score <= 1
    # device eval path and inference() agree (same store, same step)
    _, eval_score = t._eval_epoch(loaders["test_loader"])
    assert np.isclose(eval_score, score, atol=1e-6), (eval_score, score)
    save_dir = tmp_path / "t_inf_dev"
    test_files = set()
    for batch in loaders["test_loader"]:
        n_valid = int(np.sum(batch["mask"]))
        test_files.update(batch["filename"][:n_valid])
    for sub in ("img", "gt", "pred"):
        got = {p.stem for p in (save_dir / sub).glob("*.png")}
        assert test_files <= got, (sub, test_files - got)


def test_inference_explicit_checkpoint(setup, tmp_path):
    """inference(checkpoint=dir) resolves best.ckpt inside the directory,
    mirroring the reference's checkpoint argument handling."""
    root, loaders = setup
    Trainer = trainer_zoos["partial"]
    t = Trainer(configuration=_config("partial", tmp_path), save_dir="t_inf2",
                max_epoch=1, num_batches=1, crop_size=CROP,
                run_dir=str(tmp_path), **loaders)
    t.init()
    t.start_training()
    report, score = t.inference(checkpoint=str(tmp_path / "t_inf2"))
    assert np.isfinite(score)


def test_live_metrics_progress_line(setup, tmp_path, capsys):
    """Trainer.live_metrics: loss values appear in the progress line on both
    epoch paths (scan: free per-chunk readback; dispatch: opt-in sync)."""
    root, loaders = setup
    cfg = _config("partial", tmp_path)
    cfg["Trainer"].update(progress=True, live_metrics=True)
    t = trainer_zoos["partial"](
        configuration=cfg, save_dir="t_live", max_epoch=1, num_batches=2,
        crop_size=CROP, run_dir=str(tmp_path), **loaders)
    t.init()
    t.start_training()
    out = capsys.readouterr().out
    assert "sup_loss=" in out and "reg_loss=" in out

    cfg2 = _config("partial", tmp_path)
    cfg2["Trainer"].update(progress=True, live_metrics=True, device_data=True,
                           epoch_scan=True, scan_chunk=1)
    t2 = trainer_zoos["partial"](
        configuration=cfg2, save_dir="t_live2", max_epoch=1, num_batches=2,
        crop_size=CROP, run_dir=str(tmp_path), **loaders)
    t2.init()
    t2.start_training()
    out2 = capsys.readouterr().out
    assert "scan" in out2 and "sup_loss=" in out2

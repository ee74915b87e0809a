"""Contrastive pretraining pipeline tests (small shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full loops; deselect with -m 'not slow'

from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
    ACDCDataset,
    ACDCStrongTransforms,
    ContrastBatchSampler,
    TwiceLoader,
    generate_synthetic_acdc,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
    build_optimizer,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.pretrain import (
    build_finetune_mt_step,
    build_finetune_step,
    build_pretrain_decoder_step,
    build_pretrain_encoder_step,
    component_range,
    freeze_mask,
    global_labels,
    local_labels,
    unfold_blocks,
    unfold_locations,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import (
    TrainState,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.models import (
    ClusterHead,
    LocalProjectionHead,
    ProjectionHead,
    UNet,
)


def test_global_labels():
    parts = ["0", "1", "0", "2"]
    groups = ["a", "a", "b", "b"]
    np.testing.assert_array_equal(
        global_labels(parts, groups, on_patient=False, on_partition=True),
        [0, 1, 0, 2],
    )
    lab_both = global_labels(parts, groups, on_patient=True, on_partition=True)
    assert len(set(lab_both.tolist())) == 4


def test_local_labels_replication():
    parts, groups = ["0", "1"], ["a", "b"]
    locs = ["(0, 0)", "(0, 0)", "(0, 2)", "(0, 2)"]
    labels = local_labels(parts, groups, locs)
    assert len(labels) == 4
    assert len(set(labels.tolist())) == 4  # all unique here


def test_unfold_blocks_order_and_locations(rng):
    x = jnp.asarray(rng.normal(size=(3, 4, 4, 2)), jnp.float32)
    out, locs = unfold_blocks(x, (2, 2))
    assert out.shape == (12, 2, 2, 2)
    assert locs == unfold_locations((4, 4), 3, (2, 2))
    # first block = top-left 2x2 of each sample
    np.testing.assert_array_equal(np.asarray(out[:3]), np.asarray(x[:, :2, :2, :]))
    # third block (index 2) = bottom-left
    np.testing.assert_array_equal(np.asarray(out[6:9]), np.asarray(x[:, 2:, :2, :]))


def test_component_range_and_freeze_mask():
    comps = component_range("Conv1", "Conv5")
    assert comps == ["Conv1", "Conv2", "Conv3", "Conv4", "Conv5"]
    model = UNet(input_dim=1, num_classes=2)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False)
    params = {"model": v["params"], "projector": {"w": jnp.zeros(3)}}
    mask = freeze_mask(params, comps)
    assert mask["projector"]["w"] == 1.0
    flat = jax.tree_util.tree_leaves(mask["model"]["Conv1"])
    assert all(x == 1.0 for x in flat)
    flat_up = jax.tree_util.tree_leaves(mask["model"]["Up5"])
    assert all(x == 0.0 for x in flat_up)


def _state_for(model, tx, heads, crop=32, with_ema=False):
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, crop, crop, 1)), train=False)
    params = {"model": v["params"], **heads}
    ema = None
    if with_ema:
        ema = {"params": jax.tree_util.tree_map(jnp.copy, v["params"]),
               "batch_stats": jax.tree_util.tree_map(jnp.copy, v["batch_stats"])}
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=v["batch_stats"], opt_state=tx.init(params),
                      rng=jax.random.PRNGKey(1), ema_params=ema), v


def test_pretrain_encoder_step_freezes_decoder(rng):
    model = UNet(input_dim=1, num_classes=2)
    projector = ProjectionHead(output_dim=32)
    tx = build_optimizer({"name": "Adam", "lr": 1e-3})
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False)
    feats = model.apply(v, jnp.zeros((1, 32, 32, 1)), train=False, return_features=True)[1]
    proj_params = projector.init(jax.random.PRNGKey(2), feats["Conv5"])["params"]
    state, _ = _state_for(model, tx, {"projector": proj_params})
    mask = freeze_mask(jax.device_get(state.params), component_range("Conv1", "Conv5"))
    step = build_pretrain_encoder_step(model, projector, tx, mask=mask)
    batch = {
        "image": jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32),
        "image_tf": jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32),
        "labels": jnp.asarray([0, 0, 1, 1]),
    }
    before = jax.device_get(state.params)
    state2, metrics = step(state, batch)
    after = jax.device_get(state2.params)
    assert np.isfinite(float(metrics["contrastive_loss"]))
    # encoder moved
    diff_enc = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(),
                                      before["model"]["Conv1"], after["model"]["Conv1"])
    assert max(jax.tree_util.tree_leaves(diff_enc)) > 0
    # decoder frozen
    diff_dec = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(),
                                      before["model"]["Up_conv2"], after["model"]["Up_conv2"])
    assert max(jax.tree_util.tree_leaves(diff_dec)) == 0
    # projector moved
    diff_proj = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(),
                                       before["projector"], after["projector"])
    assert max(jax.tree_util.tree_leaves(diff_proj)) > 0


def test_pretrain_encoder_step_with_iic(rng):
    model = UNet(input_dim=1, num_classes=2)
    projector = ProjectionHead(output_dim=32)
    iic_head = ClusterHead(num_clusters=5, num_subheads=2)
    tx = build_optimizer({"name": "Adam", "lr": 1e-3})
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False)
    feats = model.apply(v, jnp.zeros((1, 32, 32, 1)), train=False, return_features=True)[1]
    heads = {
        "projector": projector.init(jax.random.PRNGKey(2), feats["Conv5"])["params"],
        "iic": iic_head.init(jax.random.PRNGKey(3), feats["Conv5"])["params"],
    }
    state, _ = _state_for(model, tx, heads)
    step = build_pretrain_encoder_step(model, projector, tx, iic_head=iic_head,
                                       iic_weight=0.5)
    batch = {
        "image": jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32),
        "image_tf": jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32),
        "labels": jnp.asarray([0, 0, 1, 1]),
    }
    _, metrics = step(state, batch)
    assert np.isclose(
        float(metrics["total_loss"]),
        0.5 * float(metrics["iic_loss"]) + float(metrics["contrastive_loss"]),
        rtol=1e-5,
    )


def test_pretrain_decoder_step(rng):
    model = UNet(input_dim=1, num_classes=2)
    projector = LocalProjectionHead(output_size=(4, 4))
    tx = build_optimizer({"name": "Adam", "lr": 1e-3})
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False)
    feats = model.apply(v, jnp.zeros((1, 32, 32, 1)), train=False, return_features=True)[1]
    proj_params = projector.init(jax.random.PRNGKey(2), feats["Up_conv3"])["params"]
    state, _ = _state_for(model, tx, {"projector": proj_params})
    step = build_pretrain_decoder_step(model, projector, tx)
    locs = unfold_locations((4, 4), 4, (2, 2))
    labels = local_labels(["0", "1", "0", "1"], ["a", "a", "b", "b"], locs)
    batch = {
        "image": jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32),
        "image_tf": jnp.asarray(rng.random((4, 32, 32, 1)), jnp.float32),
        "labels": jnp.asarray(labels),
    }
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["contrastive_loss"]))
    assert int(state2.step) == 1


def test_finetune_mt_step_updates_teacher(rng):
    model = UNet(input_dim=1, num_classes=3)
    tx = build_optimizer({"name": "Adam", "lr": 1e-3})
    state, v = _state_for(model, tx, {}, with_ema=True)
    step = build_finetune_mt_step(model, tx, num_classes=3, reg_weight=1.0)
    batch = {
        "image": jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32),
        "target": jnp.asarray(rng.integers(0, 3, (2, 32, 32))),
        "unlabeled_image": jnp.asarray(rng.random((3, 32, 32, 1)), jnp.float32),
    }
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["sup_loss"]))
    assert np.isfinite(float(metrics["reg_loss"]))
    # step 0 -> alpha = 0: teacher == student * (1 - wd)
    stu = jax.device_get(state2.params["model"])
    tea = jax.device_get(state2.ema_params["params"])
    s_leaf = jax.tree_util.tree_leaves(stu)[0]
    t_leaf = jax.tree_util.tree_leaves(tea)[0]
    np.testing.assert_allclose(t_leaf, s_leaf * (1 - 1e-6), rtol=1e-5)


def test_contrast_batch_sampler(tmp_path):
    generate_synthetic_acdc(str(tmp_path), num_train_patients=6, num_val_patients=2,
                            slices_per_patient=6, size=64)
    ds = ACDCDataset(str(tmp_path), "train")
    sampler = ContrastBatchSampler(ds.stems, ds.get_group, ds.get_partition,
                                   group_sample_num=3, partition_sample_num=1)
    batch = next(iter(sampler))
    assert len(batch) == 3 * 3  # 3 patients x 3 partitions
    groups = {ds.get_group(ds.stems[i]) for i in batch}
    assert len(groups) == 3
    parts = [ds.get_partition(ds.stems[i]) for i in batch]
    assert sorted(set(parts)) == ["0", "1", "2"]


def test_twice_loader(tmp_path):
    generate_synthetic_acdc(str(tmp_path), num_train_patients=4, num_val_patients=2,
                            slices_per_patient=6, size=256)
    ds = ACDCDataset(str(tmp_path), "train")
    loader = TwiceLoader(ds, ACDCStrongTransforms.pretrain, batch_size=3,
                         num_workers=0)
    b = next(iter(loader))
    assert b["image"].shape == (3, 224, 224, 1)
    assert b["image_tf"].shape == (3, 224, 224, 1)
    assert not np.array_equal(b["image"], b["image_tf"])  # independent views
    loader.set_total_freedom(False)
    b2 = next(iter(loader))
    # shared geometry: same target maps across views
    np.testing.assert_array_equal(b2["target"], b2["target_tf"])

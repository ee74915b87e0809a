"""Epoch-as-one-program (lax.scan) equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full loops; deselect with -m 'not slow'

from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
    ACDCDataset,
    generate_synthetic_acdc,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.data.device_pipeline import (
    DeviceDataStore,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
    build_optimizer,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import (
    init_train_state,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
    build_epoch_scan,
    build_eval_scan,
    build_eval_step,
    build_train_step,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.models import UNet


def _setup(tmp_path, crop=32):
    generate_synthetic_acdc(str(tmp_path), num_train_patients=4, num_val_patients=2,
                            slices_per_patient=4, size=64)
    ds = ACDCDataset(str(tmp_path), "train")
    store = DeviceDataStore(ds)
    model = UNet(input_dim=1, num_classes=4)
    tx = build_optimizer({"name": "Adam", "lr": 1e-3})
    state = init_train_state(model, tx, (1, crop, crop, 1), seed=0)
    kwargs = dict(
        num_classes=4, data_store={"labeled": store, "unlabeled": store}, crop=crop
    )
    return store, model, tx, state, kwargs


def test_epoch_scan_matches_stepwise(tmp_path, rng):
    store, model, tx, state, kwargs = _setup(tmp_path)
    step = build_train_step(model, tx, "partial", **kwargs)
    raw = build_train_step(model, tx, "partial", jit=False, **kwargs)
    epoch_fn = build_epoch_scan(raw, num_batches=3)

    lab = rng.integers(0, len(store), (3, 2)).astype(np.int32)
    unlab = rng.integers(0, len(store), (3, 3)).astype(np.int32)

    # stepwise
    s1 = state
    losses = []
    for i in range(3):
        s1, m = step(s1, {"labeled_indices": jnp.asarray(lab[i]),
                          "unlabeled_indices": jnp.asarray(unlab[i])})
        losses.append(float(m["sup_loss"]))

    # scan (fresh identical state)
    _, model2, tx2, s2, kwargs2 = _setup(tmp_path)
    raw2 = build_train_step(model2, tx2, "partial", jit=False, **kwargs2)
    epoch_fn2 = build_epoch_scan(raw2, num_batches=3)
    s2_out, stacked = epoch_fn2(s2, {"labeled_indices": jnp.asarray(lab),
                                     "unlabeled_indices": jnp.asarray(unlab)})
    # scan vs unrolled compile differ at fp32 reduction-order level; after two
    # optimizer updates the third step drifts ~1e-4 relative
    np.testing.assert_allclose(np.asarray(stacked["sup_loss"]), losses, rtol=1e-3)
    assert int(s2_out.step) == 3
    assert stacked["sup_dice_inter"].shape == (3, 2, 4)


def test_eval_scan_matches_stepwise(tmp_path):
    store, model, tx, state, kwargs = _setup(tmp_path)
    ev1 = build_eval_step(model, num_classes=4, data_store=store, crop=32)
    evs = build_eval_scan(model, num_classes=4, data_store=store, crop=32)
    indices = np.stack([np.arange(4), np.arange(4, 8)]).astype(np.int32)
    masks = np.ones((2, 4), bool)
    masks[1, 3] = False
    out_scan = jax.device_get(evs(state.params, state.batch_stats,
                                  jnp.asarray(indices), jnp.asarray(masks)))
    for i in range(2):
        out = jax.device_get(ev1(state.params, state.batch_stats,
                                 jnp.asarray(indices[i]), jnp.asarray(masks[i])))
        assert np.isclose(out_scan["loss"][i], out["loss"], rtol=1e-5)
        np.testing.assert_allclose(out_scan["inter"][i], out["inter"][0], rtol=1e-5)


def test_train_step_shear_geometry(tmp_path, rng):
    """Kernel.geometry=shear: the Pallas lane-roll rotation runs inside the
    jitted train step (interpret mode on CPU) and produces finite losses."""
    store, model, tx, state, kwargs = _setup(tmp_path)
    step = build_train_step(model, tx, "partial", geometry="shear", **kwargs)
    state, m = step(state, {
        "labeled_indices": jnp.asarray(rng.integers(0, len(store), 2).astype(np.int32)),
        "unlabeled_indices": jnp.asarray(rng.integers(0, len(store), 3).astype(np.int32)),
    })
    assert np.isfinite(float(m["sup_loss"]))
    assert int(state.step) == 1


def test_epoch_scan_preaug_amortizes_and_trains(rng, monkeypatch, tmp_path):
    """Kernel.augment=epoch: augment_pair_batch is invoked exactly twice per
    EPOCH (labeled + unlabeled store) regardless of num_batches — the whole
    point of the mode — and the epoch still trains (finite losses, params
    move, rng chains so the next epoch redraws)."""
    import jax
    import numpy as np

    from mi_based_regularized_semi_supervised_segmentation_tpu.data import (
        ACDCDataset,
        generate_synthetic_acdc,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.data.device_pipeline import (
        DeviceDataStore,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
        build_optimizer,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import (
        init_train_state,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
        build_epoch_scan_preaug,
        build_train_step,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.models import UNet
    from mi_based_regularized_semi_supervised_segmentation_tpu.ops import (
        augment_device,
    )

    calls = []
    real = augment_device.augment_pair_batch

    def spy(key, *a, **k):
        calls.append(1)
        return real(key, *a, **k)

    monkeypatch.setattr(augment_device, "augment_pair_batch", spy)

    crop, steps = 32, 3
    root = tmp_path / "preaug"
    generate_synthetic_acdc(str(root), num_train_patients=3, num_val_patients=1,
                            slices_per_patient=4, size=2 * crop)
    store = DeviceDataStore(ACDCDataset(str(root), "train"), pack=True)
    stores = {"labeled": store, "unlabeled": store}
    model = UNet(input_dim=1, num_classes=4)
    tx = build_optimizer({"name": "Adam", "lr": 1e-3})
    state = init_train_state(model, tx, (1, crop, crop, 1), seed=0)
    raw = build_train_step(model, tx, "partial", num_classes=4,
                           jit=False, reg_weight=0.0)
    epoch_fn = build_epoch_scan_preaug(raw, stores, steps, crop=crop)

    idx = np.random.default_rng(0)
    batches = {
        "labeled_indices": jax.device_put(
            idx.integers(0, len(store), (steps, 2)).astype(np.int32)),
        "unlabeled_indices": jax.device_put(
            idx.integers(0, len(store), (steps, 3)).astype(np.int32)),
    }
    params_before = jax.device_get(state.params)
    rng_before = np.asarray(jax.device_get(state.rng))
    state2, stacked = epoch_fn(state, batches)
    # trace-time invocation count: 2 calls (labeled + unlabeled), NOT 2*steps
    assert sum(calls) == 2, calls
    losses = np.asarray(jax.device_get(stacked["total_loss"]))
    assert losses.shape == (steps,) and np.all(np.isfinite(losses))
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b), params_before,
        jax.device_get(state2.params))
    assert any(jax.tree_util.tree_leaves(changed))
    assert not np.array_equal(np.asarray(jax.device_get(state2.rng)), rng_before)

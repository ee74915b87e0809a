"""Fused softmax+mask+joint Pallas kernel: interpret-mode parity vs the
composed reference (group_softmax_flat -> border mask -> XLA joint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_based_regularized_semi_supervised_segmentation_tpu.models.heads import (
    group_softmax_flat,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.ops.iic_local import (
    _block_diagonal_subheads,
    displaced_joint_xla,
    iid_segmentation_loss_fused_logits,
    iid_segmentation_small_patch_loss_flat,
    mi_from_joint,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.ops.pallas.mi_fused import (
    displaced_joint_softmax_pallas,
)

S, K = 2, 3
SK = S * K
C = 128  # lane width the head emits


def _logits(rng, B, Hp, Wp):
    """Lane-padded logits as LocalClusterHead(emit_logits) produces them:
    live S*K lanes random, dead lanes at float32 min."""
    z = np.full((B, Hp, Wp, C), np.finfo(np.float32).min, np.float32)
    z[..., :SK] = rng.normal(size=(B, Hp, Wp, SK)).astype(np.float32)
    return jnp.asarray(z)


def _reference_joint(l, pad):
    """group softmax -> interior mask -> per-displacement XLA joint."""
    B, Hp, Wp, _ = l.shape
    p = group_softmax_flat(l, S, K)
    valid = jnp.pad(jnp.ones((Hp - 2 * pad, Wp - 2 * pad)),
                    ((pad, pad), (pad, pad))).reshape(1, Hp, Wp, 1)
    p = p * valid.astype(p.dtype)
    p1, p2 = jnp.split(p, 2, axis=0)
    return displaced_joint_xla(p1[..., :SK], p2[..., :SK], pad)


@pytest.mark.parametrize("pad", [1, 2])
def test_fused_joint_matches_composed_reference(rng, pad):
    l = _logits(rng, 4, 9 + 2 * pad, 8 + 2 * pad)
    ref = _reference_joint(l, pad)
    l1, l2 = jnp.split(l, 2, axis=0)
    got = displaced_joint_softmax_pallas(l1, l2, pad, S, K, 1.0, None, jnp.float32)
    np.testing.assert_allclose(np.asarray(got[:, :, :SK, :SK]), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # dead lanes contribute exact zeros
    assert float(jnp.abs(got[:, :, SK:, :]).max()) == 0.0
    assert float(jnp.abs(got[:, :, :, SK:]).max()) == 0.0


def test_fused_joint_band_crossing(rng):
    pad = 1
    l = _logits(rng, 2, 20, 11)
    ref = _reference_joint(l, pad)
    l1, l2 = jnp.split(l, 2, axis=0)
    for band in (40, 64):
        got = displaced_joint_softmax_pallas(l1, l2, pad, S, K, 1.0, band, jnp.float32)
        np.testing.assert_allclose(np.asarray(got[:, :, :SK, :SK]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_fused_vjp_matches_autodiff_of_composed_reference(rng):
    pad = 1
    l = _logits(rng, 4, 8, 7)

    def loss_ref(l):
        return jnp.sum(jnp.sin(_reference_joint(l, pad)))

    def loss_fused(l):
        l1, l2 = jnp.split(l, 2, axis=0)
        j = displaced_joint_softmax_pallas(l1, l2, pad, S, K, 1.0, None, jnp.float32)
        return jnp.sum(jnp.sin(j[:, :, :SK, :SK]))

    v_ref, g_ref = jax.value_and_grad(loss_ref)(l)
    v_fused, g_fused = jax.value_and_grad(loss_fused)(l)
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_fused_loss_matches_flat_path(rng):
    """iid_segmentation_loss_fused_logits == mask+softmax+flat-path loss,
    values AND logit gradients."""
    pad = 1
    l = _logits(rng, 4, 10, 9)
    Hp, Wp = 10, 9

    def loss_flat(l):
        p = group_softmax_flat(l, S, K)
        valid = jnp.pad(jnp.ones((Hp - 2 * pad, Wp - 2 * pad)),
                        ((pad, pad), (pad, pad))).reshape(1, Hp, Wp, 1)
        p = p * valid.astype(p.dtype)
        p1, p2 = jnp.split(p, 2, axis=0)
        return iid_segmentation_small_patch_loss_flat(
            p1, p2, S, K, padding=pad, patch_size=1024, backend="xla",
            pre_padded=True)

    def loss_fused(l):
        l1, l2 = jnp.split(l, 2, axis=0)
        from mi_based_regularized_semi_supervised_segmentation_tpu.ops.pallas.mi_fused import (
            displaced_joint_softmax_pallas as dj,
        )
        flat = dj(l1, l2, pad, S, K, 1.0, None, jnp.float32)
        joint = _block_diagonal_subheads(flat[:, :, :SK, :SK], S, K)
        per = jax.vmap(lambda j: mi_from_joint(j, 1.0), in_axes=2)(joint)
        return jnp.mean(per)

    v1, g1 = jax.value_and_grad(loss_flat)(l)
    v2, g2 = jax.value_and_grad(loss_fused)(l)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-3, atol=1e-6)


def test_fused_step_mode(rng):
    """End-to-end udaiic step with local_emit_logits=True (interpret mode):
    finite losses, matching the unfused step's loss closely."""
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
        build_optimizer,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.state import (
        init_train_state,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.engine.steps import (
        build_train_step,
    )
    from mi_based_regularized_semi_supervised_segmentation_tpu.models import (
        ProjectorWrapper,
        UNet,
    )

    feats = ("Conv5", "Up_conv2")
    crop = 32
    batch = {
        "labeled_image": jnp.asarray(rng.random((2, crop, crop, 1)), jnp.float32),
        "labeled_target": jnp.asarray(rng.integers(0, 3, (2, crop, crop)), jnp.int32),
        "unlabeled_image": jnp.asarray(rng.random((4, crop, crop, 1)), jnp.float32),
    }
    losses = {}
    for fused in (False, True):
        model = UNet(input_dim=1, num_classes=3)
        projector = ProjectorWrapper(
            feature_names=feats, num_clusters=K, num_subheads=S,
            head_types="linear", normalize=False, local_flat=True,
            local_emit_logits=fused)
        tx = build_optimizer({"name": "Adam", "lr": 1e-3})
        state = init_train_state(model, tx, (1, crop, crop, 1), seed=0,
                                 projector=projector,
                                 projector_feature_names=feats)
        step = build_train_step(
            model, tx, "udaiic", num_classes=3, feature_names=feats,
            feature_importance=[1.0, 0.5], projector=projector,
            uda_criterion="mse", uda_weight=1.0, iic_weight=0.1,
            reg_weight=1.0, paddings=[1], patch_sizes=1024,
            backend="xla_banded" if not fused else "auto")
        _, m = step(state, batch)
        assert np.isfinite(float(m["total_loss"]))
        losses[fused] = float(m["mi"])
    # same seed/params -> the fused and unfused MI agree (interpret fp32
    # kernel vs banded XLA; bf16-free on CPU)
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-2)

"""Flat-layout cluster head parity: group_softmax_flat == per-group softmax."""

import jax
import jax.numpy as jnp
import numpy as np

from mi_based_regularized_semi_supervised_segmentation_tpu.models import (
    LocalClusterHead,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.models.heads import (
    group_softmax_flat,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.ops.iic_local import (
    iid_segmentation_small_patch_loss_flat,
    iid_segmentation_small_patch_loss_subheads,
)


def test_group_softmax_flat_matches_5d(rng):
    S, K = 3, 7
    z = jnp.asarray(rng.normal(size=(2, 4, 5, S * K)) * 3, jnp.float32)
    flat = np.asarray(group_softmax_flat(z, S, K, T=1.0))
    ref = np.asarray(jax.nn.softmax(z.reshape(2, 4, 5, S, K), axis=-1)).reshape(2, 4, 5, S * K)
    np.testing.assert_allclose(flat, ref, rtol=1e-5, atol=1e-6)
    # per-group sums to 1
    np.testing.assert_allclose(flat.reshape(2, 4, 5, S, K).sum(-1), 1.0, rtol=1e-5)


def test_group_softmax_flat_normalize(rng):
    S, K = 2, 4
    z = jnp.asarray(rng.normal(size=(3, S * K)), jnp.float32)
    flat = np.asarray(group_softmax_flat(z, S, K, normalize=True))
    zn = np.asarray(z).reshape(3, S, K)
    zn = zn / np.linalg.norm(zn, axis=-1, keepdims=True)
    e = np.exp(zn - zn.max(-1, keepdims=True))
    ref = (e / e.sum(-1, keepdims=True)).reshape(3, S * K)
    np.testing.assert_allclose(flat, ref, rtol=1e-4, atol=1e-5)


def test_local_cluster_head_flat_matches_5d(rng):
    head5 = LocalClusterHead(num_clusters=6, num_subheads=3, flat_output=False)
    headf = LocalClusterHead(num_clusters=6, num_subheads=3, flat_output=True)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    params = head5.init(jax.random.PRNGKey(0), x)
    out5 = np.asarray(head5.apply(params, x))
    outf = np.asarray(headf.apply(params, x))
    np.testing.assert_allclose(outf, out5.reshape(2, 8, 8, 18), rtol=1e-5, atol=1e-6)


def test_flat_loss_matches_5d(rng):
    S, K = 2, 5
    z1 = jnp.asarray(rng.normal(size=(2, 10, 9, S * K)), jnp.float32)
    z2 = jnp.asarray(rng.normal(size=(2, 10, 9, S * K)), jnp.float32)
    p1 = group_softmax_flat(z1, S, K)
    p2 = group_softmax_flat(z2, S, K)
    flat = float(iid_segmentation_small_patch_loss_flat(
        p1, p2, S, K, padding=1, patch_size=1024, backend="xla_banded"))
    five = float(iid_segmentation_small_patch_loss_subheads(
        p1.reshape(2, 10, 9, S, K), p2.reshape(2, 10, 9, S, K),
        padding=1, patch_size=1024, backend="xla_banded"))
    assert np.isclose(flat, five, rtol=1e-5)


def test_flat_front_door_xla_scan_matches_xla(rng):
    """The exact trainer path of the fp32-on-TPU parity mode: flat layout
    + pre_padded + backend='xla_scan' == the unrolled 'xla' reference."""
    S, K, pad = 2, 5, 1
    z1 = jnp.asarray(rng.normal(size=(2, 12, 11, S * K)), jnp.float32)
    z2 = jnp.asarray(rng.normal(size=(2, 12, 11, S * K)), jnp.float32)
    p1 = group_softmax_flat(z1, S, K)
    p2 = group_softmax_flat(z2, S, K)
    # zero the pre-padded border like _iic_regularization does
    valid = jnp.pad(jnp.ones((12 - 2 * pad, 11 - 2 * pad), p1.dtype),
                    ((pad, pad), (pad, pad))).reshape(1, 12, 11, 1)
    p1, p2 = p1 * valid, p2 * valid
    ref = float(iid_segmentation_small_patch_loss_flat(
        p1, p2, S, K, padding=pad, patch_size=1024, backend="xla",
        pre_padded=True))
    got = float(iid_segmentation_small_patch_loss_flat(
        p1, p2, S, K, padding=pad, patch_size=1024, backend="xla_scan",
        pre_padded=True))
    assert np.isclose(ref, got, rtol=1e-4)

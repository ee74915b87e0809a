"""Pallas displaced-MI kernel: interpret-mode parity vs the fp32 XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_based_regularized_semi_supervised_segmentation_tpu.ops.iic_local import (
    displaced_joint_xla,
    displaced_joint_xla_banded,
    iid_segmentation_loss_subheads,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.ops.pallas.mi_joint import (
    displaced_joint_pallas,
)


def _sm(rng, shape):
    z = rng.normal(size=shape)
    e = np.exp(z - z.max(-1, keepdims=True))
    return jnp.asarray(e / e.sum(-1, keepdims=True), jnp.float32)


@pytest.mark.parametrize("padding", [1, 2, 3])
def test_pallas_joint_matches_xla(rng, padding):
    x = _sm(rng, (2, 10, 9, 6))
    y = _sm(rng, (2, 10, 9, 6))
    ref = displaced_joint_xla(x, y, padding)
    got = displaced_joint_pallas(x, y, padding, 256, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pallas_joint_band_crossing(rng):
    """Rows crossing band boundaries must not lose shift contributions."""
    x = _sm(rng, (1, 40, 7, 4))
    y = _sm(rng, (1, 40, 7, 4))
    ref = displaced_joint_xla(x, y, 2)
    for band in (128, 256):
        got = displaced_joint_pallas(x, y, 2, band, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pallas_custom_vjp_matches_autodiff(rng):
    x = _sm(rng, (2, 8, 7, 5))
    y = _sm(rng, (2, 8, 7, 5))

    def loss_ref(a, b):
        return jnp.sum(jnp.sin(displaced_joint_xla(a, b, 1)))

    def loss_pal(a, b):
        return jnp.sum(jnp.sin(displaced_joint_pallas(a, b, 1, 128, jnp.float32)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    gp = jax.grad(loss_pal, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-5)


def test_banded_matches_plain_xla(rng):
    x = _sm(rng, (2, 12, 11, 6))
    y = _sm(rng, (2, 12, 11, 6))
    ref = displaced_joint_xla(x, y, 2)
    got = displaced_joint_xla_banded(x, y, 2, band_rows=5,
                                     precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


@pytest.mark.parametrize("padding", [1, 3])
def test_scan_backend_matches_xla_values_and_grads(rng, padding):
    """xla_scan (memory-bounded fp32 parity mode) == xla, values AND grads."""
    from mi_based_regularized_semi_supervised_segmentation_tpu.ops.iic_local import (
        displaced_joint_xla_subheads,
        displaced_joint_xla_subheads_scan,
    )

    xs = _sm(rng, (2, 12, 11, 3, 4))
    ys = _sm(rng, (2, 12, 11, 3, 4))
    ref = displaced_joint_xla_subheads(xs, ys, padding)
    got = displaced_joint_xla_subheads_scan(xs, ys, padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-7)

    def loss(back):
        def f(a, b):
            return iid_segmentation_loss_subheads(a, b, padding, backend=back)
        return f

    # fp32 summation-order noise (scan sums the padded zeros region in a
    # different association) amplified by the entropy difference: ~2e-6 rel
    lr = float(loss("xla")(xs, ys))
    ls = float(loss("xla_scan")(xs, ys))
    assert np.isclose(lr, ls, rtol=1e-4)
    gr = jax.grad(loss("xla"), argnums=(0, 1))(xs, ys)
    gs = jax.grad(loss("xla_scan"), argnums=(0, 1))(xs, ys)
    np.testing.assert_allclose(np.asarray(gs[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gs[1]), np.asarray(gr[1]), rtol=1e-4, atol=1e-6)


def test_subhead_loss_backend_parity(rng):
    xs = _sm(rng, (2, 12, 11, 3, 4))
    ys = _sm(rng, (2, 12, 11, 3, 4))
    ref = float(iid_segmentation_loss_subheads(xs, ys, 1, backend="xla"))
    banded = float(iid_segmentation_loss_subheads(xs, ys, 1, backend="xla_banded"))
    pallas = float(iid_segmentation_loss_subheads(xs, ys, 1, backend="pallas"))
    assert np.isclose(ref, banded, rtol=1e-4)
    # production pallas path rounds inputs to bf16 (MI = difference of
    # entropies amplifies it slightly); 0.5% tolerance
    assert np.isclose(ref, pallas, rtol=5e-3)

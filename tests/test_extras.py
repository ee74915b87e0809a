"""Tests for parity extras: affine augmentation, cutout, weight schedulers,
AdaBound, VGG."""

import jax
import jax.numpy as jnp
import numpy as np

from mi_based_regularized_semi_supervised_segmentation_tpu.engine.optim import (
    ConstantScheduler,
    RampScheduler,
    build_optimizer,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.models.vgg import (
    VGG11,
    ClassifyHead,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.ops.affine import (
    affine_transform,
    invert_affine_matrix,
    random_affine_matrix,
    random_cutout,
)


def test_affine_identity():
    img = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 1)), jnp.float32)
    identity = jnp.tile(jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0]]]), (2, 1, 1))
    out = affine_transform(img, identity)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_affine_inverse_roundtrip():
    # smooth image (bilinear roundtrip on white noise would legitimately blur)
    yy, xx = np.mgrid[0:32, 0:32] / 31.0
    smooth = np.exp(-((yy - 0.5) ** 2 + (xx - 0.5) ** 2) / 0.08)
    img = jnp.asarray(np.stack([smooth, smooth.T])[..., None], jnp.float32)
    m = random_affine_matrix(jax.random.PRNGKey(0), 2, degrees=15, scale=(0.95, 1.05))
    m_inv = invert_affine_matrix(m)
    # matrix-level inverse is exact
    composed_a = jnp.einsum("bij,bjk->bik", m[:, :, :2], m_inv[:, :, :2])
    np.testing.assert_allclose(np.asarray(composed_a),
                               np.tile(np.eye(2), (2, 1, 1)), atol=1e-5)
    # image-level roundtrip close in the interior (resampling error at borders)
    back = affine_transform(affine_transform(img, m), m_inv)
    interior = (slice(None), slice(8, 24), slice(8, 24), slice(None))
    err = np.abs(np.asarray(back[interior]) - np.asarray(img[interior])).mean()
    assert err < 0.08, err


def test_affine_differentiable():
    img = jnp.ones((1, 8, 8, 1))
    m = random_affine_matrix(jax.random.PRNGKey(1), 1)
    g = jax.grad(lambda x: jnp.sum(affine_transform(x, m)))(img)
    assert np.all(np.isfinite(np.asarray(g)))


def test_random_cutout():
    img = jnp.ones((3, 16, 16, 1))
    out = random_cutout(jax.random.PRNGKey(0), img, 4, 8, pad_value=0.0)
    out = np.asarray(out)
    for b in range(3):
        zeros = (out[b, ..., 0] == 0).sum()
        assert zeros >= 1  # some box got cut (may be clipped at border)
    assert out.max() == 1.0


def test_ramp_scheduler():
    s = RampScheduler(begin_epoch=2, max_epoch=10, min_value=0.0, max_value=1.0)
    assert s.get_lr(0) == 0.0
    assert s.get_lr(2) < 0.01
    assert s.get_lr(10) == 1.0
    vals = [s.get_lr(e) for e in range(2, 11)]
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))


def test_constant_scheduler():
    s = ConstantScheduler(begin_epoch=2, value=5.0)
    assert s.value == 0.0
    s.step(); s.step()
    assert s.value == 5.0


def test_adabound_bounds_converge():
    tx = build_optimizer({"name": "AdaBound", "lr": 0.1, "final_lr": 0.01,
                          "gamma": 0.1})
    params = {"w": jnp.asarray(1.0)}
    state = tx.init(params)
    for _ in range(5):
        updates, state = tx.update({"w": jnp.asarray(1.0)}, state, params)
        params = {"w": params["w"] + updates["w"]}
    assert np.isfinite(float(params["w"]))
    assert float(params["w"]) < 1.0  # descended


def test_vgg11_shapes():
    model = VGG11(input_dim=1)
    x = jnp.zeros((2, 64, 64, 1))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(v, x, train=False)
    assert feats.shape == (2, 512)
    head = ClassifyHead(num_classes=10)
    hv = head.init(jax.random.PRNGKey(1), feats)
    proj, logits = head.apply(hv, feats)
    assert proj.shape == (2, 256) and logits.shape == (2, 10)

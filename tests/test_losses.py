"""Golden-value tests of the loss functions against brute-force numpy oracles
implementing the published formulas (IIC MI, KL, displaced joint)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_based_regularized_semi_supervised_segmentation_tpu.ops import (
    compute_joint,
    displaced_joint_xla,
    entropy,
    iid_loss,
    iid_segmentation_loss,
    iid_segmentation_small_patch_loss,
    kl_div,
    mi_from_joint,
    mse_consistency,
    supcon_loss,
)


def softmax_np(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_kl_div_matches_cross_entropy_for_onehot(rng):
    probs = softmax_np(rng.normal(size=(6, 4)))
    labels = rng.integers(0, 4, size=6)
    onehot = np.eye(4)[labels]
    got = float(kl_div(jnp.asarray(probs), jnp.asarray(onehot)))
    # formula: mean over b of sum_c -t log((p+eps)/(t+eps))
    eps = 1e-16
    expect = np.mean(np.sum(-onehot * np.log((probs + eps) / (onehot + eps)), axis=-1))
    assert np.isclose(got, expect, rtol=1e-4)
    # equals CE up to eps
    ce = np.mean(-np.log(probs[np.arange(6), labels]))
    assert np.isclose(got, ce, rtol=1e-4)


def test_kl_div_weighted_and_reductions(rng):
    probs = softmax_np(rng.normal(size=(5, 3)))
    target = softmax_np(rng.normal(size=(5, 3)))
    w = np.array([1.0, 2.0, 3.0])
    got = float(kl_div(jnp.asarray(probs), jnp.asarray(target), weight=jnp.asarray(w)))
    wn = w / w.sum() * 3
    eps = 1e-16
    expect = np.mean(np.sum(-target * np.log((probs + eps) / (target + eps)) * wn, axis=-1))
    assert np.isclose(got, expect, rtol=1e-4)
    none_red = kl_div(jnp.asarray(probs), jnp.asarray(target), reduction="none")
    assert none_red.shape == (5,)
    assert np.isclose(float(jnp.mean(none_red)),
                      float(kl_div(jnp.asarray(probs), jnp.asarray(target))))


def test_entropy_uniform_is_logk():
    p = jnp.full((3, 8), 1 / 8)
    assert np.isclose(float(entropy(p)), np.log(8), rtol=1e-5)


def test_compute_joint_properties(rng):
    p1 = softmax_np(rng.normal(size=(10, 5)))
    p2 = softmax_np(rng.normal(size=(10, 5)))
    j = np.asarray(compute_joint(jnp.asarray(p1), jnp.asarray(p2)))
    # oracle
    raw = np.einsum("bk,bl->kl", p1, p2)
    raw = (raw + raw.T) / 2
    raw = raw / raw.sum()
    np.testing.assert_allclose(j, raw, rtol=1e-5)
    assert np.isclose(j.sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(j, j.T, rtol=1e-6)


def test_iid_loss_identical_is_negative_entropy(rng):
    # MI(X, X) = H(X): loss of identical inputs = -H of the marginal joint diag.
    p = softmax_np(rng.normal(size=(64, 4)))
    loss, loss_no_lamb, joint = iid_loss(jnp.asarray(p), jnp.asarray(p))
    # oracle from formula
    raw = np.einsum("bk,bl->kl", p, p)
    raw = (raw + raw.T) / 2
    pij = raw / raw.sum()
    pi = pij.sum(1, keepdims=True)
    pj = pij.sum(0, keepdims=True)
    expect = -np.sum(pij * (np.log(pij + 1e-10) - np.log(pj + 1e-10) - np.log(pi + 1e-10)))
    assert np.isclose(float(loss), expect, rtol=1e-3)
    assert np.isclose(float(loss), float(loss_no_lamb), rtol=1e-6)  # lamb=1


def test_iid_loss_independent_near_zero_mi(rng):
    # one-hot assignments drawn independently => MI ~ 0 => loss ~ 0
    a = np.eye(4)[rng.integers(0, 4, size=20000)]
    b = np.eye(4)[rng.integers(0, 4, size=20000)]
    loss, *_ = iid_loss(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    assert abs(float(loss)) < 0.01


def displaced_joint_oracle(x, x_tf, p):
    """Brute-force: J[dy+p, dx+p, k1, k2] = sum_{b,y,x} x[b,y+dy,x+dx,k1] * x_tf[b,y,x,k2]."""
    B, H, W, K = x.shape
    T = 2 * p + 1
    out = np.zeros((T, T, K, K))
    for dy in range(-p, p + 1):
        for dx in range(-p, p + 1):
            for y in range(H):
                for xx in range(W):
                    yy, xx2 = y + dy, xx + dx
                    if 0 <= yy < H and 0 <= xx2 < W:
                        out[dy + p, dx + p] += np.einsum("bk,bl->kl", x[:, yy, xx2], x_tf[:, y, xx])
    return out


@pytest.mark.parametrize("padding", [1, 2])
def test_displaced_joint_xla_vs_oracle(rng, padding):
    x = softmax_np(rng.normal(size=(2, 6, 5, 3)))
    x_tf = softmax_np(rng.normal(size=(2, 6, 5, 3)))
    got = np.asarray(displaced_joint_xla(jnp.asarray(x), jnp.asarray(x_tf), padding))
    expect = displaced_joint_oracle(x, x_tf, padding)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def test_mi_from_joint_matches_formula(rng):
    T, K = 3, 4
    joint = np.abs(rng.normal(size=(T, T, K, K))) + 0.1
    got = float(mi_from_joint(jnp.asarray(joint)))
    # oracle: min-subtract, per-slice normalize, symmetrize, MI
    p = joint - joint.min() + 1e-16
    p = p / p.sum(axis=(2, 3), keepdims=True)
    p = (p + p.transpose(0, 1, 3, 2)) / 2
    pi = p.sum(axis=2, keepdims=True)
    pj = p.sum(axis=3, keepdims=True)
    expect = np.sum(-p * (np.log(p + 1e-16) - np.log(pi + 1e-16) - np.log(pj + 1e-16))) / (T * T)
    assert np.isclose(got, expect, rtol=1e-3)


def test_iid_segmentation_loss_differentiable(rng):
    x = jnp.asarray(softmax_np(rng.normal(size=(2, 8, 8, 4))))
    x_tf = jnp.asarray(softmax_np(rng.normal(size=(2, 8, 8, 4))))

    def f(a):
        return iid_segmentation_loss(a, x_tf, padding=1, backend="xla")

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert np.all(np.isfinite(np.asarray(g)))


def test_small_patch_loss_degenerate_single_tile(rng):
    # patch >= H: must equal plain segmentation loss (reference degeneracy at
    # patch 1024, SURVEY §2.5)
    x = jnp.asarray(softmax_np(rng.normal(size=(2, 8, 8, 3))))
    y = jnp.asarray(softmax_np(rng.normal(size=(2, 8, 8, 3))))
    a = float(iid_segmentation_small_patch_loss(x, y, padding=1, patch_size=1024, backend="xla"))
    b = float(iid_segmentation_loss(x, y, padding=1, backend="xla"))
    assert np.isclose(a, b, rtol=1e-6)


def test_small_patch_loss_tiles(rng):
    x = jnp.asarray(softmax_np(rng.normal(size=(1, 10, 10, 3))))
    y = jnp.asarray(softmax_np(rng.normal(size=(1, 10, 10, 3))))
    # patch 4, stride 2 -> offsets (0,2,4,6) per axis -> 16 tiles averaged
    val = float(iid_segmentation_small_patch_loss(x, y, padding=1, patch_size=4, backend="xla"))
    offs = [0, 2, 4, 6]
    tiles = [
        float(iid_segmentation_loss(x[:, h:h + 4, w:w + 4], y[:, h:h + 4, w:w + 4],
                                    padding=1, backend="xla"))
        for h in offs for w in offs
    ]
    assert np.isclose(val, np.mean(tiles), rtol=1e-6)


def test_mse_consistency_zero_grad_through_target(rng):
    a = jnp.asarray(softmax_np(rng.normal(size=(2, 4, 4, 3))))
    b = jnp.asarray(softmax_np(rng.normal(size=(2, 4, 4, 3))))
    val = float(mse_consistency(a, b))
    assert np.isclose(val, np.mean((np.asarray(a) - np.asarray(b)) ** 2), rtol=1e-6)
    g = jax.grad(lambda t: mse_consistency(a, t))(b)
    assert float(jnp.sum(jnp.abs(g))) == 0.0  # detached target


def test_supcon_loss_sanity(rng):
    feats = rng.normal(size=(8, 2, 16))
    feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    loss = float(supcon_loss(jnp.asarray(feats), jnp.asarray(labels)))
    assert np.isfinite(loss) and loss > 0
    # aligned views of same label should give lower loss than random
    base = rng.normal(size=(8, 16))
    base = base / np.linalg.norm(base, axis=-1, keepdims=True)
    aligned = np.stack([base, base], axis=1)
    aligned_by_label = aligned.copy()
    for lab in range(4):
        idx = np.where(labels == lab)[0]
        aligned_by_label[idx] = aligned[idx[0]]
    loss_aligned = float(supcon_loss(jnp.asarray(aligned_by_label), jnp.asarray(labels)))
    assert loss_aligned < loss

import jax
import jax.numpy as jnp
import numpy as np

from mi_based_regularized_semi_supervised_segmentation_tpu.ops import (
    apply_flips,
    sample_flip_mask,
)


def test_flip_mask_shape_and_rate():
    mask = sample_flip_mask(jax.random.PRNGKey(0), 4096, threshold=0.8)
    assert mask.shape == (4096, 2)
    rate = float(jnp.mean(mask))
    assert 0.77 < rate < 0.83


def test_apply_flips_matches_manual(rng):
    x = jnp.asarray(rng.normal(size=(4, 6, 5, 3)))
    mask = jnp.asarray([[True, False], [False, True], [True, True], [False, False]])
    out = np.asarray(apply_flips(x, mask))
    xn = np.asarray(x)
    np.testing.assert_array_equal(out[0], xn[0][::-1, :, :])
    np.testing.assert_array_equal(out[1], xn[1][:, ::-1, :])
    np.testing.assert_array_equal(out[2], xn[2][::-1, ::-1, :])
    np.testing.assert_array_equal(out[3], xn[3])


def test_flips_involution(rng):
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 2)))
    mask = sample_flip_mask(jax.random.PRNGKey(1), 3)
    np.testing.assert_allclose(
        np.asarray(apply_flips(apply_flips(x, mask), mask)), np.asarray(x)
    )


def test_flip_equivariance_pairing(rng):
    """f(T x) vs T f(x) for a flip-equivariant f: identical pairing —
    the invariant the reference builds via seed replay."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)))
    mask = jnp.asarray([[True, True], [True, False]])

    def f(img):  # an equivariant local op
        return img * 2.0 + jnp.roll(img, 0, axis=1)

    np.testing.assert_allclose(
        np.asarray(f(apply_flips(x, mask))),
        np.asarray(apply_flips(f(x), mask)),
        rtol=1e-6,
    )


def test_flips_extra_trailing_axes(rng):
    # works on [B, H, W, S, K] subhead prob maps too
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3, 5)))
    mask = jnp.asarray([[True, False], [False, True]])
    out = np.asarray(apply_flips(x, mask))
    xn = np.asarray(x)
    np.testing.assert_array_equal(out[0], xn[0][::-1])
    np.testing.assert_array_equal(out[1], xn[1][:, ::-1])

"""Interpret-mode tests for the experimental Pallas 3-shear rotation."""

import numpy as np
import jax.numpy as jnp

from mi_based_regularized_semi_supervised_segmentation_tpu.ops.augment_device import (
    rotate_nearest_batch,
)
from mi_based_regularized_semi_supervised_segmentation_tpu.ops.pallas.rotate import (
    rotate_shear_pallas,
    rotate_shear_pallas_lanes,
)


def test_identity_and_variant_agreement(rng):
    img = rng.integers(0, 256, (3, 64, 64)).astype(np.float32)
    ang = rng.uniform(-45, 45, 3).astype(np.float32)
    z = np.asarray(rotate_shear_pallas(jnp.asarray(img),
                                       jnp.zeros(3, np.float32)))
    np.testing.assert_array_equal(z, img)
    a = np.asarray(rotate_shear_pallas(jnp.asarray(img), jnp.asarray(ang)))
    b = np.asarray(rotate_shear_pallas_lanes(jnp.asarray(img), jnp.asarray(ang)))
    np.testing.assert_array_equal(a, b)


def test_close_to_exact_rotation_on_structured_content(rng):
    """Shear rotation is a pixel permutation; vs true nearest rotation it
    differs only in sub-pixel resampling — >=99% pixel agreement on
    structured content, mass conserved for in-canvas content."""
    g = np.zeros((1, 64, 64), np.float32)
    g[0, 24:40, 24:40] = 1.0
    e = np.asarray(rotate_nearest_batch(jnp.asarray(g), jnp.asarray([30.0])))
    s = np.asarray(rotate_shear_pallas(jnp.asarray(g), jnp.asarray([30.0])))
    assert (e == s).mean() > 0.99
    assert s.sum() == g.sum()  # permutation: mass conserved

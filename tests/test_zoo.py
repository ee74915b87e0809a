"""Arch registry + alternative model families (reference wheel arch zoo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_based_regularized_semi_supervised_segmentation_tpu.models.zoo import (
    ARCH_CALLABLES,
    AttentionUNet,
    ENet,
    VNet,
    get_arch,
)


def test_registry_surface():
    for name in ("contrastunet", "unet", "enet", "attention_unet", "vnet"):
        assert name in ARCH_CALLABLES, name
    m = get_arch("UNet", {"input_dim": 1, "num_classes": 4, "arch": "ignored"})
    assert m.num_classes == 4
    with pytest.raises(AssertionError):
        get_arch("nope", {})


def test_enet_forward_shapes():
    m = ENet(input_dim=1, num_classes=4)
    x = jnp.zeros((2, 64, 64, 1))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 64, 64, 4)
    assert np.all(np.isfinite(np.asarray(y)))


def test_attention_unet_forward_shapes():
    m = AttentionUNet(input_dim=1, num_classes=3)
    x = jnp.zeros((2, 32, 32, 1))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 32, 32, 3)


def test_vnet_forward_shapes():
    m = VNet(input_dim=1, num_classes=2)
    x = jnp.zeros((1, 16, 16, 16, 1))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 16, 16, 16, 2)


def test_enet_train_mode_updates_bn(rng):
    m = ENet(input_dim=1, num_classes=2)
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y, mut = m.apply(v, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert y.shape == (2, 32, 32, 2)
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


def test_deeplab_family_shapes(rng):
    import jax
    import jax.numpy as jnp

    from mi_based_regularized_semi_supervised_segmentation_tpu.models.zoo import (
        get_arch,
    )

    x = jnp.asarray(rng.random((2, 32, 32, 1)).astype("float32"))
    for name in ("deeplabv2", "deeplabv3", "deeplabv3plus"):
        model = get_arch(name, {"input_dim": 1, "num_classes": 4,
                                "n_blocks": (1, 1, 1, 1)})
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out, _ = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        assert out.shape == (2, 32, 32, 4), name
        assert out.dtype == jnp.float32


def test_densenet3d_classifier(rng):
    import jax
    import jax.numpy as jnp

    from mi_based_regularized_semi_supervised_segmentation_tpu.models.zoo import (
        get_arch,
    )

    model = get_arch("densenet3d", {"input_dim": 1, "num_classes": 3,
                                    "block_config": (1, 1)})
    x = jnp.asarray(rng.random((2, 8, 16, 16, 1)).astype("float32"))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 3)

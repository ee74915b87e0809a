import jax
import jax.numpy as jnp
import numpy as np

from mi_based_regularized_semi_supervised_segmentation_tpu.models import (
    ClusterHead,
    LocalClusterHead,
    LocalProjectionHead,
    ProjectionHead,
    ProjectorWrapper,
    UNET_DIMENSIONS,
    UNet,
    split_feature_names,
)


def test_unet_shapes_and_taps():
    model = UNet(input_dim=1, num_classes=4)
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (logits, feats), _ = model.apply(
        variables, x, train=True, return_features=True, mutable=["batch_stats"]
    )
    assert logits.shape == (2, 64, 64, 4)
    # channel dims match the reference dimension_dict (unet.py:44-54)
    for name, dim in UNET_DIMENSIONS.items():
        assert feats[name].shape[-1] == dim, name
    # spatial pyramid
    assert feats["Conv5"].shape[1:3] == (4, 4)
    assert feats["Up_conv3"].shape[1:3] == (32, 32)
    assert feats["Up_conv2"].shape[1:3] == (64, 64)


def test_unet_eval_deterministic():
    model = UNet(input_dim=1, num_classes=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    a = model.apply(variables, x, train=False)
    b = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_batch_stats_update():
    model = UNet(input_dim=1, num_classes=2)
    x = jnp.ones((2, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_cluster_head_simplex():
    head = ClusterHead(num_clusters=20, num_subheads=5)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 4, 4, 256)), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (3, 5, 20)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


def test_cluster_head_mlp_and_normalize():
    head = ClusterHead(num_clusters=10, num_subheads=3, head_type="mlp", normalize=True)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 4, 64)), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (2, 3, 10)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


def test_local_cluster_head_simplex():
    head = LocalClusterHead(num_clusters=20, num_subheads=5)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 32)), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (2, 8, 8, 5, 20)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


def test_projection_heads():
    g = ProjectionHead(output_dim=256)
    x = jnp.zeros((2, 4, 4, 256))
    params = g.init(jax.random.PRNGKey(0), x)
    assert g.apply(params, x).shape == (2, 256)

    l = LocalProjectionHead(output_size=(4, 4))
    xl = jnp.zeros((2, 16, 16, 32))
    params_l = l.init(jax.random.PRNGKey(0), xl)
    assert l.apply(params_l, xl).shape == (2, 4, 4, 32)


def test_projector_wrapper_routing():
    names = ("Conv5", "Up_conv3", "Up_conv2")
    wrapper = ProjectorWrapper(feature_names=names, num_clusters=20, num_subheads=5)
    feats = {
        "Conv5": jnp.zeros((2, 4, 4, 256)),
        "Up_conv3": jnp.zeros((2, 16, 16, 32)),
        "Up_conv2": jnp.zeros((2, 32, 32, 16)),
    }
    params = wrapper.init(jax.random.PRNGKey(0), feats)
    out = wrapper.apply(params, feats)
    assert out["Conv5"].shape == (2, 5, 20)           # global head
    assert out["Up_conv3"].shape == (2, 16, 16, 5, 20)  # local head
    assert out["Up_conv2"].shape == (2, 32, 32, 5, 20)


def test_split_feature_names():
    enc, dec = split_feature_names(["Conv5", "Up_conv3", "Up_conv2"])
    assert enc == ["Conv5"]
    assert dec == ["Up_conv3", "Up_conv2"]


def test_weight_norm_dump():
    """Per-parameter L2 norms keyed by dotted path (reference
    UNet.weight_norm(), contrastyou/arch/unet.py:196-200)."""
    import jax
    import jax.numpy as jnp

    from mi_based_regularized_semi_supervised_segmentation_tpu.models.unet import (
        UNet,
        weight_norm,
    )

    m = UNet(input_dim=1, num_classes=3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)), train=False)
    wn = weight_norm(v["params"])
    assert len(wn) > 20
    assert all(isinstance(x, float) and x >= 0 for x in wn.values())
    key = next(iter(wn))
    assert "." in key and key.split(".")[0] in v["params"]


def test_unet_s2d_stem_shapes(rng):
    """Experimental space-to-depth stem: logits stay full-resolution, taps
    land on the halved grid, s2d/d2s round-trip exactly."""
    import jax
    import jax.numpy as jnp

    from mi_based_regularized_semi_supervised_segmentation_tpu.models.unet import (
        UNet,
        depth_to_space,
        space_to_depth,
    )

    x = rng.random((2, 8, 8, 3)).astype("float32")
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(jnp.asarray(x), 2), 2)), x)

    model = UNet(input_dim=1, num_classes=4, stem="s2d")
    inp = jnp.asarray(rng.random((2, 32, 32, 1)).astype("float32"))
    variables = model.init(jax.random.PRNGKey(0), inp, train=False)
    logits, feats = model.apply(variables, inp, train=False, return_features=True)
    assert logits.shape == (2, 32, 32, 4)
    assert feats["Conv1"].shape == (2, 16, 16, 16)   # halved grid
    assert feats["Conv5"].shape == (2, 1, 1, 256)
    assert feats["Up_conv2"].shape == (2, 16, 16, 16)


def test_unet_remat_identical_numerics(rng):
    """remat=True is a pure memory/recompute trade: forward and gradients
    bit-match the non-remat model."""
    import jax
    import jax.numpy as jnp

    from mi_based_regularized_semi_supervised_segmentation_tpu.models.unet import UNet

    x = jnp.asarray(rng.random((2, 32, 32, 1)).astype("float32"))
    tgt = jnp.asarray(rng.random((2, 32, 32, 4)).astype("float32"))
    base = UNet(input_dim=1, num_classes=4)
    rem = UNet(input_dim=1, num_classes=4, remat=True)
    variables = base.init(jax.random.PRNGKey(0), x, train=False)

    def loss(model, params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             x, train=True, mutable=["batch_stats"])
        return jnp.mean((out - tgt) ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(base, p))(variables["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(rem, p))(variables["params"])
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

"""2D U-Net with named feature taps, in flax.linen (NHWC, TPU layout).

Capability parity with the reference UNet (/root/reference/contrastyou/arch/
unet.py:10-200): 4-down/4-up, channels 16..256, each block =
2x(Conv3x3 no-bias + BN + ReLU); up = nearest-upsample(x2) + Conv3x3 + BN +
ReLU; skip concat; 1x1 head to num_classes. Feature positions keep the
reference names (Conv1..Conv5, Up_conv5..Up_conv2) so the
``Trainer.feature_names`` config surface stays valid.

TPU-first departures from the reference:
- NHWC layout (XLA's preferred conv layout on TPU) instead of NCHW.
- Features are *returned* from the pure forward (a dict tap), replacing the
  reference's stateful forward hooks (semi_seg/_utils.py:38-78) — hooks don't
  exist in a traced functional graph, and returning them lets XLA DCE unused
  taps per trainer mode.
- Configurable compute dtype (bfloat16 activations/weights-cast) with fp32
  BatchNorm statistics.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

UNET_DIMENSIONS: Dict[str, int] = {
    "Conv1": 16,
    "Conv2": 32,
    "Conv3": 64,
    "Conv4": 128,
    "Conv5": 256,
    "Up_conv5": 128,
    "Up_conv4": 64,
    "Up_conv3": 32,
    "Up_conv2": 16,
}

ENCODER_NAMES = ["Conv1", "Conv2", "Conv3", "Conv4", "Conv5"]
DECODER_NAMES = ["Up5", "Up_conv5", "Up4", "Up_conv4", "Up3", "Up_conv3", "Up2", "Up_conv2", "DeConv_1x1"]
COMPONENT_NAMES = ENCODER_NAMES + DECODER_NAMES

# Feature positions exposed to trainers (tap-able outputs).
TAP_NAMES = ["Conv1", "Conv2", "Conv3", "Conv4", "Conv5",
             "Up_conv5", "Up_conv4", "Up_conv3", "Up_conv2"]


def _conv_init(dtype):
    # Match torch Conv2d default (kaiming_uniform with a=sqrt(5)) in spirit:
    # variance-scaling uniform on fan_in.
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform", dtype=jnp.float32)


class ConvBlock(nn.Module):
    """2x (Conv3x3 no-bias -> BN -> ReLU)."""

    features: int
    dtype: Any = jnp.float32
    bn_dtype: Any = jnp.float32  # bf16 saves ~23% of U-Net step time; fp32 = parity

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, kernel_init=_conv_init(self.dtype),
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.bn_dtype, name=f"bn{i}")(
                x, mask=bn_mask)
            x = nn.relu(x)
        return x


class UpConv(nn.Module):
    """Nearest-neighbor upsample x2 -> Conv3x3 -> BN -> ReLU."""

    features: int
    dtype: Any = jnp.float32
    bn_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, kernel_init=_conv_init(self.dtype), name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.bn_dtype, name="bn")(x, mask=bn_mask)
        return nn.relu(x)


class _HeadConv1x1(nn.Module):
    """1x1 classification head as an einsum with an nn.Conv-shaped param
    tree ({kernel [1,1,Cin,Cout], bias [Cout]}) — see the call-site comment
    in UNet for why this beats nn.Conv's weight-grad lowering."""

    features: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", _conv_init(self.dtype),
                            (1, 1, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x.astype(self.dtype) @ kernel[0, 0].astype(self.dtype)
                + bias.astype(self.dtype))


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/r, W/r, r*r*C] (pixel-unshuffle)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // r, W // r, r * r * C)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, r*r*C] -> [B, H*r, W*r, C] (pixel-shuffle)."""
    B, H, W, RC = x.shape
    C = RC // (r * r)
    x = x.reshape(B, H, W, r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * r, W * r, C)


class UNet(nn.Module):
    """stem="conv" is the reference-parity architecture. stem="s2d" is an
    EXPERIMENTAL throughput variant (SURVEY §6 conv-floor lever): the input
    is pixel-unshuffled 2x (224²x1 -> 112²x4) before Conv1 and the logits
    are predicted as 4·C channels at half resolution and pixel-shuffled
    back — the two 16-channel full-resolution stages (the worst MXU
    utilization in the net) then run at quarter area. Feature taps keep
    their names at the halved grid. NOT parity: capability must be
    spot-checked before production use."""

    input_dim: int = 1
    num_classes: int = 4
    dtype: Any = jnp.float32
    bn_dtype: Any = jnp.float32
    stem: str = "conv"
    remat: bool = False  # jax.checkpoint each block: ~half the activation
    # HBM for one extra forward's FLOPs — the standard TPU batch-scaling
    # lever (identical numerics; test_models.py asserts it)

    dimension_dict = UNET_DIMENSIONS

    @property
    def encoder_names(self):
        return list(ENCODER_NAMES)

    @property
    def decoder_names(self):
        return list(DECODER_NAMES)

    @property
    def component_names(self):
        return list(COMPONENT_NAMES)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        return_features: bool = False,
        bn_mask: Optional[jnp.ndarray] = None,
    ):
        """x: [B, H, W, input_dim] (NHWC). Returns logits [B, H, W, C] in
        fp32 and, when return_features, a dict of the nine named taps.

        bn_mask: optional [B, 1, 1, 1] row-validity mask for train-mode BN
        statistics — pad-and-mask batch sharding (indivisible global batches
        rounded up to the device count) keeps BN parity by excluding pad rows
        from every layer's batch statistics."""
        x = x.astype(self.dtype)
        if self.stem == "s2d":
            x = space_to_depth(x, 2)
        ConvBlock_ = ConvBlock
        UpConv_ = UpConv
        if self.remat:
            # static_argnums counts self=0, x=1, train=2; bn_mask (None or
            # array) stays traced
            ConvBlock_ = nn.remat(ConvBlock, static_argnums=(2,))
            UpConv_ = nn.remat(UpConv, static_argnums=(2,))
        e1 = ConvBlock_(16, self.dtype, self.bn_dtype, name="Conv1")(x, train, bn_mask)
        e2 = ConvBlock_(32, self.dtype, self.bn_dtype, name="Conv2")(nn.max_pool(e1, (2, 2), (2, 2)), train, bn_mask)
        e3 = ConvBlock_(64, self.dtype, self.bn_dtype, name="Conv3")(nn.max_pool(e2, (2, 2), (2, 2)), train, bn_mask)
        e4 = ConvBlock_(128, self.dtype, self.bn_dtype, name="Conv4")(nn.max_pool(e3, (2, 2), (2, 2)), train, bn_mask)
        e5 = ConvBlock_(256, self.dtype, self.bn_dtype, name="Conv5")(nn.max_pool(e4, (2, 2), (2, 2)), train, bn_mask)

        d5 = UpConv_(128, self.dtype, self.bn_dtype, name="Up5")(e5, train, bn_mask)
        d5 = ConvBlock_(128, self.dtype, self.bn_dtype, name="Up_conv5")(jnp.concatenate([e4, d5], axis=-1), train, bn_mask)

        d4 = UpConv_(64, self.dtype, self.bn_dtype, name="Up4")(d5, train, bn_mask)
        d4 = ConvBlock_(64, self.dtype, self.bn_dtype, name="Up_conv4")(jnp.concatenate([e3, d4], axis=-1), train, bn_mask)

        d3 = UpConv_(32, self.dtype, self.bn_dtype, name="Up3")(d4, train, bn_mask)
        d3 = ConvBlock_(32, self.dtype, self.bn_dtype, name="Up_conv3")(jnp.concatenate([e2, d3], axis=-1), train, bn_mask)

        d2 = UpConv_(16, self.dtype, self.bn_dtype, name="Up2")(d3, train, bn_mask)
        d2 = ConvBlock_(16, self.dtype, self.bn_dtype, name="Up_conv2")(jnp.concatenate([e1, d2], axis=-1), train, bn_mask)

        head_ch = self.num_classes * (4 if self.stem == "s2d" else 1)
        # 1x1 head as an explicit matmul over the channel axis: the nn.Conv
        # lowering pays the conv WEIGHT-GRAD pathology (XLA lowers the
        # [B,H,W,16] x [B,H,W,C] -> [1,1,16,C] contraction as a slow
        # convolution fusion — 1.44 ms/step of the 65.5 ms bare step in the
        # r5 trace, same pathology models/heads.py:88 documents for the
        # cluster heads); the einsum grad is one MXU contraction. Param
        # tree/shapes unchanged ([1,1,Cin,Cout] kernel + bias), so
        # checkpoints and the torch-porting tests are untouched; a 1x1 conv
        # IS this matmul, bit-comparable up to fp accumulation order.
        head = _HeadConv1x1(head_ch, self.dtype, name="DeConv_1x1")
        logits = head(d2)
        if self.stem == "s2d":
            logits = depth_to_space(logits, 2)
        logits = logits.astype(jnp.float32)

        if return_features:
            features = {
                "Conv1": e1, "Conv2": e2, "Conv3": e3, "Conv4": e4, "Conv5": e5,
                "Up_conv5": d5, "Up_conv4": d4, "Up_conv3": d3, "Up_conv2": d2,
            }
            return logits, features
        return logits


def weight_norm(params) -> "OrderedDict[str, float]":
    """Per-parameter L2 norms keyed by dotted path — the reference's
    UNet.weight_norm() debug dump (contrastyou/arch/unet.py:196-200)."""
    from collections import OrderedDict

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = OrderedDict()
    for path, leaf in flat:
        name = ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[name] = float(jnp.linalg.norm(jnp.asarray(leaf, jnp.float32)))
    return out


def component_param_filter(names: Sequence[str]):
    """Path-filter for freezing reference-named components
    (mirrors UNet.enable_grad(from_, util), unet.py:135-182): returns a
    predicate over flax param paths that is True when the path belongs to one
    of ``names``."""
    names = set(names)

    def predicate(path: Tuple[str, ...]) -> bool:
        return len(path) > 0 and path[0] in names

    return predicate

"""Cluster / projection heads over U-Net feature positions.

Capability parity with /root/reference/contrastyou/trainer/_utils.py:44-168
(ClusterHead, LocalClusterHead, ProjectionHead, LocalProjectionHead) and the
multi-position wrappers of /root/reference/semi_seg/_utils.py:81-224.

TPU-first departures:
- Subheads are a single batched parameter tensor, evaluated as ONE matmul
  (global) or ONE 1x1 conv (local) producing [.., S, K]; the reference looped
  a Python list of nn.Sequential subheads. For 'linear' heads this is
  mathematically identical (concatenated output channels) and keeps the MXU
  busy with one big contraction instead of 5 tiny ones.
- NHWC layout; simplex outputs have K on the LAST axis.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import DECODER_NAMES, ENCODER_NAMES, UNET_DIMENSIONS


def _dense_init():
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def split_feature_names(feature_names: Sequence[str]) -> Tuple[List[str], List[str]]:
    """Partition feature names into (encoder, decoder) in reference order
    (semi_seg/_utils.py:18-25)."""
    enc = [f for f in feature_names if f in ENCODER_NAMES]
    dec = [f for f in feature_names if f in DECODER_NAMES or f in ("Up_conv5", "Up_conv4", "Up_conv3", "Up_conv2")]
    assert len(enc) + len(dec) == len(feature_names), feature_names
    return enc, dec


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _group_indicator(S: int, K: int, dtype) -> jnp.ndarray:
    """[S*K, S] one-hot of lane -> subhead group."""
    return jnp.asarray(
        (jnp.arange(S * K)[:, None] // K) == jnp.arange(S)[None, :], dtype
    )


def group_softmax_flat(z: jnp.ndarray, S: int, K: int, T: float = 1.0,
                       normalize: bool = False) -> jnp.ndarray:
    """Per-subhead softmax computed entirely in the FLAT [..., C] layout
    with C >= S*K (trailing lanes are dead and come out as exact zeros).

    A [..., S, K] tensor puts K=20 on the TPU lane axis (padded to 128) and
    S=5 on sublanes (padded to 8) — ~10x memory bloat plus relayouts on
    every elementwise op. Instead: subtract the per-pixel GLOBAL max across
    the live lanes (valid for each group's softmax since it is constant per
    pixel), exponentiate, and normalize per group via two tiny matmuls with
    the [C, S] group-indicator matrix. Emitting C=128 (lane-width) directly
    lets the displaced-MI kernel consume the maps with zero pad copies."""
    C = z.shape[-1]
    assert C >= S * K, (C, S, K)
    live = C == S * K
    if not live:
        # dead lanes -> -inf so exp()=0; keeps them out of the max too
        lane_live = (jnp.arange(C) < S * K)
        z = jnp.where(lane_live, z, jnp.asarray(-jnp.inf, z.dtype))
    if normalize:
        g = _group_indicator_padded(S, K, C, jnp.float32)
        zl = jnp.where(jnp.isfinite(z), z, 0).astype(jnp.float32) if not live else z.astype(jnp.float32)
        sq = jnp.matmul(zl * zl, g)                              # [..., S]
        inv = jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
        z = z * jnp.matmul(inv, g.T).astype(z.dtype)             # [..., C]
    z = z / T
    m = jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    e = jnp.exp(z - m)
    # one [C, C] group-sum-broadcast matmul (G2 = Ind @ Ind^T). The two-hop
    # [.., C]@[C, S] -> [.., S]@[S, C] version leaves 123 of 128 output lanes
    # idle on both MXU passes (~5 ms/step at Up_conv2); the fat single dot is
    # ~20x faster despite 25x the nominal FLOPs.
    g2 = _group_indicator_padded(S, K, C, jnp.float32)
    g2 = jnp.matmul(g2, g2.T).astype(e.dtype)                     # [C, C] 0/1
    # bf16 e against the 0/1 matrix with fp32 accumulation is EXACT (each
    # product is a bf16 value or 0), so numerics match the fp32 two-hop form
    denom = jnp.matmul(e, g2, preferred_element_type=jnp.float32).astype(e.dtype)
    if live:
        return e / denom
    # dead lanes have denom == 0: the double-where keeps the 1/denom VJP off
    # those lanes entirely (a max() clamp still routes NaN gradients through)
    lane_live_b = jnp.arange(C) < S * K
    return jnp.where(lane_live_b, e / jnp.where(lane_live_b, denom, 1.0), 0.0)


def _group_indicator_padded(S: int, K: int, C: int, dtype) -> jnp.ndarray:
    """[C, S] one-hot of lane -> subhead group; zero rows for dead lanes."""
    lane = jnp.arange(C)
    return jnp.asarray(
        (lane[:, None] // K == jnp.arange(S)[None, :]) & (lane[:, None] < S * K),
        dtype,
    )


class ClusterHead(nn.Module):
    """Global (encoder) cluster head: avg-pool -> linear/mlp -> [normalize] ->
    softmax/T over K clusters, S subheads batched. Output [B, S, K] simplex
    on the last axis."""

    num_clusters: int = 10
    num_subheads: int = 5
    head_type: str = "linear"
    T: float = 1.0
    normalize: bool = False
    interm_dim: int = 128

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        assert features.ndim == 4, features.shape  # [B, H, W, C]
        x = jnp.mean(features.astype(jnp.float32), axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        S, K = self.num_subheads, self.num_clusters
        if self.head_type == "linear":
            out = nn.Dense(S * K, kernel_init=_dense_init(), name="linear")(x)
            out = out.reshape(x.shape[0], S, K)
        else:  # mlp: per-subhead hidden layer (subheads share nothing)
            dim = x.shape[-1]
            w1 = self.param("w1", _dense_init(), (S, dim, self.interm_dim))
            b1 = self.param("b1", nn.initializers.zeros, (S, self.interm_dim))
            w2 = self.param("w2", _dense_init(), (S, self.interm_dim, K))
            b2 = self.param("b2", nn.initializers.zeros, (S, K))
            h = jnp.einsum("bd,sdi->bsi", x, w1) + b1
            h = nn.leaky_relu(h, 0.01)
            out = jnp.einsum("bsi,sik->bsk", h, w2) + b2
        if self.normalize:
            out = _l2_normalize(out, axis=-1)
        return nn.softmax(out / self.T, axis=-1)


class LocalClusterHead(nn.Module):
    """Per-pixel (decoder) cluster head: 1x1 conv (or conv-LReLU-conv) ->
    [normalize] -> softmax/T, preserving HxW. Output [B, H, W, S, K].

    ``dtype``: compute/output dtype — bf16 halves the HBM traffic of the
    large per-pixel probability maps feeding the displaced-MI kernel (which
    accumulates in fp32 regardless)."""

    num_clusters: int = 10
    num_subheads: int = 5
    head_type: str = "linear"
    T: float = 1.0
    normalize: bool = False
    interm_dim: int = 64
    dtype: Any = jnp.float32
    flat_output: bool = False  # True: return [B, H, W, S*K] (TPU hot path)
    lane_multiple: int = 1     # pad flat output channels to this multiple
                               # (128 lets the MI kernel skip all pad copies)
    emit_logits: bool = False  # True (flat only): skip the softmax and return
                               # lane-padded LOGITS — consumed by the fused
                               # softmax+mask+joint Pallas kernel (mi_fused)

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        assert features.ndim == 4, features.shape
        x = features.astype(self.dtype)
        S, K = self.num_subheads, self.num_clusters
        B, H, W, _ = x.shape
        if self.head_type == "linear":
            # 1x1 conv as an explicit matmul: XLA's conv weight-grad path
            # lowers [B,H,W,Cin] x [B,H,W,SK] -> [1,1,Cin,SK] as a slow
            # convolution fusion (~9 ms/step at Up_conv2); the einsum grad is
            # one MXU contraction over the flattened pixels.
            dim = x.shape[-1]
            kernel = self.param("kernel", _dense_init(), (dim, S * K))
            bias = self.param("bias", nn.initializers.zeros, (S * K,))
            out = x @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        else:
            dim = x.shape[-1]
            w1 = self.param("w1", _dense_init(), (S, dim, self.interm_dim))
            b1 = self.param("b1", nn.initializers.zeros, (S, self.interm_dim))
            w2 = self.param("w2", _dense_init(), (S, self.interm_dim, K))
            b2 = self.param("b2", nn.initializers.zeros, (S, K))
            h = jnp.einsum("bhwd,sdi->bhwsi", x, w1.astype(self.dtype)) + b1.astype(self.dtype)
            h = nn.leaky_relu(h, 0.01)
            out = jnp.einsum("bhwsi,sik->bhwsk", h, w2.astype(self.dtype)) + b2.astype(self.dtype)
            out = out.reshape(B, H, W, S * K)
        if self.flat_output:
            # stay in the flat layout end-to-end (see group_softmax_flat)
            if self.lane_multiple > 1 and out.shape[-1] % self.lane_multiple:
                cp = -(-out.shape[-1] // self.lane_multiple) * self.lane_multiple
                out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, cp - out.shape[-1])],
                              constant_values=float(jnp.finfo(jnp.float32).min))
            if self.emit_logits:
                assert not self.normalize and self.T == 1.0, \
                    "emit_logits covers the linear/T=1/unnormalized hot path"
                return out
            return group_softmax_flat(out, S, K, self.T, self.normalize)
        out = out.reshape(B, H, W, S, K)
        if self.normalize:
            out = _l2_normalize(out, axis=-1)
        return nn.softmax(out / self.T, axis=-1)


class ProjectionHead(nn.Module):
    """Global contrastive projection: pool -> flatten -> linear/mlp -> D."""

    output_dim: int = 256
    interm_dim: int = 256
    head_type: str = "mlp"

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        x = jnp.mean(features.astype(jnp.float32), axis=(1, 2))
        if self.head_type == "mlp":
            x = nn.Dense(self.interm_dim, kernel_init=_dense_init())(x)
            x = nn.leaky_relu(x, 0.01)
        return nn.Dense(self.output_dim, kernel_init=_dense_init())(x)


class LocalProjectionHead(nn.Module):
    """Local contrastive projection: 3x3 conv(s) -> adaptive max-pool to
    ``output_size``. Output [B, oh, ow, C_out]."""

    head_type: str = "mlp"
    output_size: Tuple[int, int] = (4, 4)

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        x = features.astype(jnp.float32)
        x = nn.Conv(64, (3, 3), padding=1, kernel_init=_dense_init())(x)
        if self.head_type == "mlp":
            x = nn.leaky_relu(x, 0.01)
            x = nn.Conv(32, (3, 3), padding=1, kernel_init=_dense_init())(x)
        # adaptive max pool to output_size
        B, H, W, C = x.shape
        oh, ow = self.output_size
        assert H % oh == 0 and W % ow == 0, (H, W, self.output_size)
        x = x.reshape(B, oh, H // oh, ow, W // ow, C)
        return jnp.max(x, axis=(2, 4))


class ProjectorWrapper(nn.Module):
    """Multi-position cluster-head bundle keyed by UNet feature name.

    Encoder positions get ClusterHead (global), decoder positions get
    LocalClusterHead (per-pixel), mirroring ProjectorWrapper.init_encoder/
    init_decoder (semi_seg/_utils.py:137-186). Params for head config may be
    scalars (broadcast) or per-position lists (reference ``_nlist``).
    """

    feature_names: Tuple[str, ...]
    num_clusters: Any = 20
    num_subheads: Any = 5
    head_types: Any = "linear"
    normalize: Any = False
    local_dtype: Any = jnp.float32
    local_flat: bool = False  # decoder heads emit flat probs (TPU hot path)
    local_lane_multiple: int = 128  # lane pad for flat decoder heads
    local_emit_logits: bool = False  # decoder heads emit LOGITS for the
                                     # fused softmax+joint kernel (mi_fused)

    def _cfg(self, value, idx: int):
        if isinstance(value, (list, tuple)):
            assert len(value) == len(self.feature_names)
            return value[idx]
        return value

    def head_shape(self, name: str) -> Tuple[int, int]:
        """(num_subheads, num_clusters) for a position."""
        idx = list(self.feature_names).index(name)
        return int(self._cfg(self.num_subheads, idx)), int(self._cfg(self.num_clusters, idx))

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """features: dict of name -> feature map [B, H, W, C]. Returns dict of
        name -> simplex probs ([B, S, K] for encoder, [B, H, W, S, K] for
        decoder positions)."""
        out: Dict[str, jnp.ndarray] = {}
        for i, name in enumerate(self.feature_names):
            kwargs = dict(
                num_clusters=self._cfg(self.num_clusters, i),
                num_subheads=self._cfg(self.num_subheads, i),
                head_type=self._cfg(self.head_types, i),
                normalize=self._cfg(self.normalize, i),
            )
            if name in ENCODER_NAMES:
                out[name] = ClusterHead(**kwargs, name=name)(features[name])
            else:
                out[name] = LocalClusterHead(
                    **kwargs, dtype=self.local_dtype,
                    flat_output=self.local_flat,
                    lane_multiple=self.local_lane_multiple if self.local_flat else 1,
                    emit_logits=self.local_emit_logits and self.local_flat,
                    name=name)(features[name])
        return out

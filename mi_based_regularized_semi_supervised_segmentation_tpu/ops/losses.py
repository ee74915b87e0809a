"""Pure-function losses (class axis LAST — NHWC / [..., C] layout).

Parity targets:
- kl_div / entropy / simplex_cross_entropy / jsd_div:
  WHEEL::deepclustering2/loss/kl_losses.py:21-176. kl_div with a one-hot
  target is the supervised criterion of the reference (semi_seg/main.py:36).
- mse_consistency: torch nn.MSELoss over softmaxes (semi_seg/trainer.py:137).
- supcon_loss: /root/reference/contrastyou/losses/contrast_loss.py:11-100
  (Tian-style supervised contrastive).

All are jit-compatible pure functions returning fp32 scalars (or unreduced
arrays with reduction="none").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(x: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def kl_div(
    prob: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
    eps: float = 1e-16,
) -> jnp.ndarray:
    """KL(target || prob) summed over the last (class) axis.

    = sum_c -t_c * log((p_c + eps) / (t_c + eps)); with one-hot target this is
    cross-entropy. ``weight``: per-class weights, normalized to mean 1 as in
    the reference."""
    prob = prob.astype(jnp.float32)
    target = jax.lax.stop_gradient(target.astype(jnp.float32))
    kl = -target * jnp.log((prob + eps) / (target + eps))
    if weight is not None:
        weight = jnp.asarray(weight, jnp.float32)
        weight = weight / jnp.sum(weight) * weight.shape[0]
        kl = kl * weight
    kl = jnp.sum(kl, axis=-1)
    return _reduce(kl, reduction)


def entropy(prob: jnp.ndarray, reduction: str = "mean", eps: float = 1e-16) -> jnp.ndarray:
    """-sum_c p log p over the last axis."""
    e = -jnp.sum(prob * jnp.log(prob + eps), axis=-1)
    return _reduce(e, reduction)


def simplex_cross_entropy(
    prob: jnp.ndarray, target: jnp.ndarray, reduction: str = "mean", eps: float = 1e-16
) -> jnp.ndarray:
    ce = jnp.sum(-jax.lax.stop_gradient(target) * jnp.log(prob + eps), axis=-1)
    return _reduce(ce, reduction)


def jsd_div(*probs: jnp.ndarray, reduction: str = "mean", eps: float = 1e-16) -> jnp.ndarray:
    mean_prob = sum(probs) / len(probs)
    f_term = entropy(mean_prob, reduction=reduction, eps=eps)
    mean_entropy = sum(entropy(p, reduction=reduction, eps=eps) for p in probs) / len(probs)
    return f_term - mean_entropy


def mse_consistency(pred_probs: jnp.ndarray, target_probs: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error between two softmax maps; target is detached
    (reference: UDATrainEpocher.regularization, semi_seg/epocher.py:215-226)."""
    target_probs = jax.lax.stop_gradient(target_probs)
    diff = pred_probs.astype(jnp.float32) - target_probs.astype(jnp.float32)
    return jnp.mean(diff * diff)


def supcon_loss(
    features: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
) -> jnp.ndarray:
    """Supervised contrastive loss.

    features: [B, n_views, D] L2-normalized. labels: [B] ints (same label =>
    positives) or mask: [B, B] floats. With labels=None and mask=None this is
    SimCLR. Mirrors contrast_loss.py:11-100.
    """
    assert features.ndim == 3, features.shape
    B, n_views, _ = features.shape
    if labels is not None and mask is not None:
        raise ValueError("Cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(B, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = jnp.asarray(labels == labels.T, jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    contrast_features = jnp.concatenate(jnp.split(features, n_views, axis=1), axis=0).squeeze(1)  # [B*V, D]
    if contrast_mode == "one":
        anchor_features = features[:, 0]
        anchor_count = 1
    else:
        anchor_features = contrast_features
        anchor_count = n_views

    logits = anchor_features @ contrast_features.T / temperature
    # numerical stability
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    mask = jnp.tile(mask, (anchor_count, n_views))
    # mask out self-contrast
    n_anchor = anchor_count * B
    logits_mask = 1.0 - jnp.eye(n_anchor, B * n_views, dtype=jnp.float32)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))

    pos_count = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / pos_count

    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss)

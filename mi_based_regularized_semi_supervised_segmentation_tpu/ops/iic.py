"""Global IIC mutual-information loss (invariant information clustering).

Parity target: /root/reference/contrastyou/losses/iic_loss.py:31-94
(IIDLoss.forward + compute_joint). Minimizing the returned loss maximizes the
mutual information of the K x K joint distribution accumulated over the batch
of paired cluster assignments.

Inputs are [B, K] simplex rows (class axis last). The joint is a single
K x K matmul — trivially MXU-friendly; no kernel needed at K=20.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_joint(x_out: jnp.ndarray, x_tf_out: jnp.ndarray, symmetric: bool = True) -> jnp.ndarray:
    """Joint probability matrix P[k1,k2] = sum_b p1[b,k1] p2[b,k2], then
    symmetrized and normalized to sum 1."""
    assert x_out.ndim == 2 and x_out.shape == x_tf_out.shape, (x_out.shape, x_tf_out.shape)
    # fp32 accumulation at full precision — the joint feeds logs downstream.
    p = jnp.matmul(
        x_out.astype(jnp.float32).T,
        x_tf_out.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )  # [K, K]
    if symmetric:
        p = (p + p.T) / 2.0
    return p / jnp.sum(p)


def iid_loss(
    x_out: jnp.ndarray, x_tf_out: jnp.ndarray, lamb: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (loss, loss_no_lamb, joint). loss = sum P*(log P - lamb log Pi
    - lamb log Pj) negated — the negative MI, to be minimized."""
    k = x_out.shape[-1]
    p_i_j = compute_joint(x_out, x_tf_out)
    p_i = jnp.sum(p_i_j, axis=1, keepdims=True)  # [K, 1] marginal
    p_j = jnp.sum(p_i_j, axis=0, keepdims=True)  # [1, K]
    log_p = jnp.log(p_i_j + 1e-10)
    log_pi = jnp.log(jnp.broadcast_to(p_i, (k, k)) + 1e-10)
    log_pj = jnp.log(jnp.broadcast_to(p_j, (k, k)) + 1e-10)
    loss = -jnp.sum(p_i_j * (log_p - lamb * log_pj - lamb * log_pi))
    loss_no_lamb = -jnp.sum(p_i_j * (log_p - log_pj - log_pi))
    return loss, loss_no_lamb, p_i_j

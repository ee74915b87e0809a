"""TrainState: the single PyTree holding everything the jitted step mutates.

Replaces the reference's scattered mutable objects (nn.Module params, BN
buffers, torch optimizer state, scheduler counters — recursively collected by
TrainerIOMixin.state_dict, WHEEL::trainer/_io.py:108-126) with one functional
dataclass: params (model + optional projector), batch_stats, opt_state, rng
key, step counter, optional EMA params (mean teacher).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any            # {"model": ..., "projector": ...(optional)}
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Any = None  # mean-teacher shadow of params["model"], or None


def init_train_state(
    model,
    tx: optax.GradientTransformation,
    input_shape: Tuple[int, ...],
    seed: int = 0,
    projector=None,
    projector_feature_names=None,
    with_ema: bool = False,
) -> TrainState:
    """Initialize model (+ projector) params with a dummy forward."""
    key = jax.random.PRNGKey(seed)
    init_key, proj_key, state_key = jax.random.split(key, 3)
    dummy = jnp.zeros(input_shape, jnp.float32)
    variables = model.init(init_key, dummy, train=False)
    params: Dict[str, Any] = {"model": variables["params"]}
    batch_stats = variables.get("batch_stats", FrozenDict())

    if projector is not None:
        _, feats = model.apply(variables, dummy, train=False, return_features=True)
        feats = {name: feats[name] for name in projector_feature_names}
        proj_vars = projector.init(proj_key, feats)
        params["projector"] = proj_vars["params"]

    opt_state = tx.init(params)
    # The teacher carries its OWN BN running stats (the reference ema_updater
    # mixes BN buffers too, WHEEL::deepclustering2/models/ema.py:7-130).
    ema = (
        {
            "params": jax.tree_util.tree_map(jnp.copy, params["model"]),
            "batch_stats": jax.tree_util.tree_map(jnp.copy, batch_stats),
        }
        if with_ema
        else None
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=state_key,
        ema_params=ema,
    )

"""Optimizers + the reference LR schedule, as optax transforms.

Parity targets:
- Optimizer-by-name surface (WHEEL::deepclustering2/optim/__init__.py:1-11;
  trainers instantiate via config name, semi_seg/trainer.py:67-72). Torch
  Adam semantics: L2 weight decay added to the gradient BEFORE the Adam
  moments (torch ``weight_decay``), eps 1e-8, betas (0.9, 0.999) — hence
  chain(add_decayed_weights, scale_by_adam), NOT adamw.
- GradualWarmupScheduler(multiplier=400, total_epoch=10) wrapping
  CosineAnnealingLR(T_max=max_epoch-10, eta_min=1e-7)
  (WHEEL::deepclustering2/schedulers/warmup_scheduler.py:13-75;
  semi_seg/trainer.py:52-65). The torch schedulers step once per epoch; the
  exact epoch->lr table they produce is reimplemented in ``lr_at_epoch``:
  epoch 0 at base lr, linear ramp to base*multiplier at epoch=total_epoch
  (held through epoch total_epoch+1 by the torch handover off-by-one), then
  cosine decay toward eta_min.

The learning rate is injected as an optimizer hyperparameter
(optax.inject_hyperparams) so the per-epoch lr change mutates opt_state
without recompiling the jitted train step.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import optax


def lr_at_epoch(
    epoch: int,
    base_lr: float,
    multiplier: float = 400.0,
    warmup_max: int = 10,
    max_epoch: int = 100,
    eta_min: float = 1e-7,
) -> float:
    """LR used DURING 0-based ``epoch``, matching the torch scheduler pair."""
    if epoch <= warmup_max:
        return base_lr * ((multiplier - 1.0) * epoch / warmup_max + 1.0)
    t_max = max_epoch - warmup_max
    t = epoch - warmup_max - 1  # torch handover consumes one step at peak
    peak = base_lr * multiplier
    return eta_min + (peak - eta_min) * (1 + math.cos(math.pi * t / t_max)) / 2


def _sgd(lr, momentum: float = 0.0, weight_decay: float = 0.0, nesterov: bool = False, **_):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.trace(decay=momentum, nesterov=nesterov) if momentum else optax.identity(),
        optax.scale_by_learning_rate(lr),
    )


def _adam(lr, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, **_):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(lr),
    )


def _adamw(lr, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999,
           eps: float = 1e-8, **_):
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(lr),
    )


def _radam(lr, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999,
           eps: float = 1e-8, **_):
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_radam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(lr),
    )


OPTIMIZERS = {
    "Adam": _adam,
    "AdamW": _adamw,
    "SGD": _sgd,
    "RAdam": _radam,
}


def build_optimizer(optim_config: Dict[str, Any]) -> optax.GradientTransformation:
    """optim_config: the ``Optim`` config section ({name, lr, weight_decay,
    ...}). Returns an inject_hyperparams-wrapped transform whose
    ``opt_state.hyperparams['lr']`` can be reassigned per epoch."""
    cfg = dict(optim_config)
    name = cfg.pop("name", "Adam")
    if name not in OPTIMIZERS:
        raise KeyError(f"unknown optimizer {name!r}; available: {sorted(OPTIMIZERS)}")
    lr = float(cfg.pop("lr", 1e-3))
    factory = OPTIMIZERS[name]

    def make(lr):
        return factory(lr, **{k: float(v) for k, v in cfg.items()})

    return optax.inject_hyperparams(make)(lr=lr)


def set_learning_rate(opt_state, lr: float):
    """Functionally update the injected lr hyperparameter."""
    import jax.numpy as jnp

    opt_state.hyperparams["lr"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state

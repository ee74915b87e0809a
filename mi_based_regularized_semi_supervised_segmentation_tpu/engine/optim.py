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


def _adabound(lr, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, final_lr: float = 0.1, gamma: float = 1e-3, **_):
    """AdaBound (WHEEL::deepclustering2/optim/adabound.py): Adam whose
    effective per-parameter step is clipped to a band converging to
    ``final_lr`` (SGD-like) as training proceeds."""
    import chex
    import jax
    import jax.numpy as jnp
    import optax as _optax

    def init(params):
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": jax.tree_util.tree_map(jnp.zeros_like, params),
            "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
        }

    def update(grads, state, params=None):
        if weight_decay and params is not None:
            grads = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p, grads, params)
        count = state["count"] + 1
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], grads)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        step_size = lr * jnp.sqrt(bc2) / bc1
        t = count.astype(jnp.float32)
        lower = final_lr * (1 - 1 / (gamma * t + 1))
        upper = final_lr * (1 + 1 / (gamma * t))

        def upd(m, v):
            denom = jnp.sqrt(v) + eps
            eff = jnp.clip(step_size / denom, lower, upper)
            return -eff * m

        updates = jax.tree_util.tree_map(upd, mu, nu)
        return updates, {"count": count, "mu": mu, "nu": nu}

    del chex, _optax
    return optax.GradientTransformation(init, update)


def _coupled(scale_factory):
    """torch.optim semantics: L2 weight decay is added to the gradient
    BEFORE the accumulator update (coupled), then the lr scales the step.
    Builds an optimizer factory around an optax scale_by_* transform."""

    def factory(lr, weight_decay: float = 0.0, **kw):
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            scale_factory(**kw),
            optax.scale_by_learning_rate(lr),
        )

    return factory


def _rmsprop(lr, weight_decay: float = 0.0, alpha: float = 0.99,
             eps: float = 1e-8, momentum: float = 0.0,
             centered: bool = False, **_):
    scale = (optax.scale_by_stddev(decay=alpha, eps=eps) if centered
             else optax.scale_by_rms(decay=alpha, eps=eps))
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        scale,
        optax.trace(decay=momentum) if momentum else optax.identity(),
        optax.scale_by_learning_rate(lr),
    )


def _lookahead_of(inner_factory, sync_period: int = 5, slow_step: float = 0.5):
    """torch_optimizer.Lookahead/Ranger: fast weights stepped by the inner
    optimizer, slow weights pulled toward them every sync_period steps.
    NOTE: requires ``optax.LookaheadParams`` trees; exposed for API-surface
    parity — the trainers use flat param trees, so this is opt-in for users
    who adopt the lookahead param container."""

    def factory(lr, **kw):
        return optax.lookahead(inner_factory(lr, **kw), sync_period=sync_period,
                               slow_step_size=slow_step)

    return factory


# Optimizer-by-name surface. The reference re-exports the whole
# ``torch.optim.* + torch_optimizer.*`` namespace
# (WHEEL::deepclustering2/optim/__init__.py:1-11); every name below follows
# the torch-coupled weight-decay convention except AdamW/Lamb (decoupled by
# definition). Names its configs actually use: SGD/Adam/AdamW/RAdam/AdaBound.
OPTIMIZERS = {
    # torch.optim
    "Adam": _adam,
    "AdamW": _adamw,
    "SGD": _sgd,
    "RAdam": _radam,
    "NAdam": _coupled(lambda b1=0.9, b2=0.999, eps=1e-8, **_:
                      optax.scale_by_adam(b1=b1, b2=b2, eps=eps, nesterov=True)),
    "Adadelta": _coupled(lambda rho=0.9, eps=1e-6, **_:
                         optax.scale_by_adadelta(rho=rho, eps=eps)),
    "Adagrad": _coupled(lambda eps=1e-10, initial_accumulator_value=0.0, **_:
                        optax.scale_by_rss(
                            initial_accumulator_value=initial_accumulator_value,
                            eps=eps)),
    "Adamax": _coupled(lambda b1=0.9, b2=0.999, eps=1e-8, **_:
                       optax.scale_by_adamax(b1=b1, b2=b2, eps=eps)),
    "RMSprop": _rmsprop,
    "Rprop": _coupled(lambda eta_minus=0.5, eta_plus=1.2, **_:
                      optax.scale_by_rprop(learning_rate=1.0,
                                           eta_minus=eta_minus,
                                           eta_plus=eta_plus)),
    # torch_optimizer
    "AdaBound": _adabound,
    "AdaBelief": _coupled(lambda b1=0.9, b2=0.999, eps=1e-16, **_:
                          optax.scale_by_belief(b1=b1, b2=b2, eps=eps)),
    "Yogi": _coupled(lambda b1=0.9, b2=0.999, eps=1e-3, **_:
                     optax.scale_by_yogi(b1=b1, b2=b2, eps=eps)),
    "NovoGrad": _coupled(lambda b1=0.9, b2=0.25, eps=1e-8, **_:
                         optax.scale_by_novograd(b1=b1, b2=b2, eps=eps)),
    "Lamb": lambda lr, weight_decay=0.0, b1=0.9, b2=0.999, eps=1e-6, **_:
        optax.chain(optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                    optax.add_decayed_weights(weight_decay),
                    optax.scale_by_trust_ratio(),
                    optax.scale_by_learning_rate(lr)),
    "Lion": lambda lr, weight_decay=0.0, b1=0.9, b2=0.99, **_:
        optax.chain(optax.scale_by_lion(b1=b1, b2=b2),
                    optax.add_decayed_weights(weight_decay),
                    optax.scale_by_learning_rate(lr)),
    "Lookahead": _lookahead_of(_adam),
    "Ranger": _lookahead_of(_radam, sync_period=6),
}


class RampScheduler:
    """Linear loss-weight ramp between epochs (WHEEL::deepclustering2/
    schedulers/customized_scheduler.py RampScheduler) — available for
    weight ramps, mirroring the reference's unused-but-shipped scheduler."""

    def __init__(self, begin_epoch: int, max_epoch: int, min_value: float,
                 max_value: float, ramp_mult: float = -5.0) -> None:
        self.begin_epoch = int(begin_epoch)
        self.max_epoch = int(max_epoch)
        self.min_value = float(min_value)
        self.max_value = float(max_value)
        self.mult = float(ramp_mult)
        self.epoch = 0

    def step(self) -> None:
        self.epoch += 1

    @property
    def value(self) -> float:
        return self.get_lr(self.epoch)

    def get_lr(self, epoch: int) -> float:
        if epoch < self.begin_epoch:
            return self.min_value
        if epoch >= self.max_epoch:
            return self.max_value
        frac = (epoch - self.begin_epoch) / max(self.max_epoch - self.begin_epoch, 1)
        ramp = math.exp(self.mult * (1.0 - frac) ** 2)
        return self.min_value + (self.max_value - self.min_value) * ramp


class ConstantScheduler:
    def __init__(self, begin_epoch: int = 0, value: float = 1.0) -> None:
        self.begin_epoch = int(begin_epoch)
        self._value = float(value)
        self.epoch = 0

    def step(self) -> None:
        self.epoch += 1

    @property
    def value(self) -> float:
        return self._value if self.epoch >= self.begin_epoch else 0.0


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
    """Return a NEW opt_state with the injected lr hyperparameter replaced.

    Purely functional: the input state (which may have been donated into a
    jitted step) is never mutated — callers must rebind, e.g.
    ``state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))``.
    """
    import jax.numpy as jnp

    hyper = dict(opt_state.hyperparams)
    hyper["lr"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hyper)

"""Tensor/dict utilities (JAX/numpy equivalents of the reference helpers).

Reference parity: WHEEL::deepclustering2/utils/general.py:176-336 (simplex,
one_hot, class2one_hot, probs2one_hot), contrastyou/helper/utils.py:8-56
(average_iter, weighted_average_iter, flatten_dict), utils/githash.py:6-20.
"""

from __future__ import annotations

import random
import subprocess
from typing import Any, Dict, Iterable, Mapping, Sequence

import jax.numpy as jnp
import numpy as np

Array = Any  # jnp.ndarray or np.ndarray


def simplex(probs: Array, axis: int = 1, atol: float = 1e-4) -> bool:
    """True if ``probs`` sums to 1 along ``axis`` (host-side check helper)."""
    s = np.asarray(jnp.sum(probs, axis=axis))
    return bool(np.allclose(s, 1.0, atol=atol))


def one_hot(t: Array, axis: int = 1, atol: float = 1e-4) -> bool:
    vals = np.asarray(t)
    return simplex(vals, axis, atol) and bool(np.all((vals == 0) | (vals == 1)))


def class2one_hot(labels: Array, num_classes: int, class_axis: int = 1) -> jnp.ndarray:
    """Integer label map -> one-hot, class axis inserted at ``class_axis``.

    class2one_hot(labels[B,H,W], C) -> [B,C,H,W] for class_axis=1, or
    [B,H,W,C] for class_axis=-1 (the TPU-native NHWC layout).
    """
    oh = jnp.asarray(labels[..., None] == jnp.arange(num_classes), dtype=jnp.int32)
    if class_axis in (-1, oh.ndim - 1):
        return oh
    return jnp.moveaxis(oh, -1, class_axis)


def probs2one_hot(probs: Array, class_axis: int = 1) -> jnp.ndarray:
    num_classes = probs.shape[class_axis]
    argmax = jnp.argmax(probs, axis=class_axis)
    return class2one_hot(argmax, num_classes, class_axis=class_axis)


def logit2one_hot(logits: Array, class_axis: int = 1) -> jnp.ndarray:
    return probs2one_hot(logits, class_axis=class_axis)


def average_iter(values: Iterable[Any]):
    values = list(values)
    return sum(values) / float(len(values))


def weighted_average_iter(values: Sequence[Any], weights: Sequence[float]):
    assert len(values) == len(weights), (len(values), len(weights))
    total_w = sum(weights)
    return sum(v * w for v, w in zip(values, weights)) / float(total_w)


def flatten_dict(d: Mapping[str, Any], parent_key: str = "", sep: str = "/") -> Dict[str, Any]:
    items: Dict[str, Any] = {}
    for k, v in d.items():
        key = f"{parent_key}{sep}{k}" if parent_key else str(k)
        if isinstance(v, Mapping):
            items.update(flatten_dict(v, key, sep=sep))
        else:
            items[key] = v
    return items


def set_seed(seed: int) -> None:
    """Seed host-side RNGs. Device-side randomness is keyed via jax.random,
    so (unlike the reference's set_benchmark) nothing device-global to set."""
    random.seed(seed)
    np.random.seed(seed)


def gethash(cwd: str = ".") -> str:
    """Current git hash for provenance capture in the run config snapshot."""
    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=cwd, stderr=subprocess.DEVNULL
            )
            .decode()
            .strip()
        )
    except Exception:
        return "unknown"


class ExceptionIgnorer:
    """Context manager swallowing the listed exception types (guards
    Hausdorff on empty masks, as in the reference's utils/assertion.py:172-186)."""

    def __init__(self, *exceptions):
        self._exceptions = exceptions or (Exception,)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        return exc_type is not None and issubclass(exc_type, self._exceptions)

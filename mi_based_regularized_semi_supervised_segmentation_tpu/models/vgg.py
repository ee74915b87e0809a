"""VGG11 backbone + classify/projection heads.

Parity target: /root/reference/contrastyou/arch/vgg.py:1-41 (torchvision
vgg11 wrapper with projection/prediction heads — unused by any reference
entry point, kept for capability parity). Implemented natively in flax
(NHWC) rather than wrapping torchvision.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

_VGG11_CFG = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


class VGG11(nn.Module):
    input_dim: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for i, spec in enumerate(_VGG11_CFG):
            if spec == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(int(spec), (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=jnp.float32, name=f"bn{i}")(x)
                x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2))  # [B, 512]


class ClassifyHead(nn.Module):
    num_classes: int = 10
    interm_dim: int = 256

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        proj = nn.Dense(self.interm_dim)(features)
        proj = nn.leaky_relu(proj, 0.01)
        logits = nn.Dense(self.num_classes)(proj)
        return proj, logits

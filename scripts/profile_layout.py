"""Layout experiment: U-Net-shaped conv stack in NHWC (C minor, 16 lanes)
vs NCHW (W minor, 224 lanes) on TPU — tests whether the step's elementwise/
data-movement dominance is a lane-utilization problem."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

K = 20


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def timeit(fn, *args):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(K):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / K * 1e3


CHANNELS = [(1, 16), (16, 16), (16, 32), (32, 32), (32, 64), (64, 64),
            (64, 128), (128, 128), (128, 256), (256, 256)]
SIZES = [224, 224, 112, 112, 56, 56, 28, 28, 14, 14]


def make_params(key, layout):
    ps = []
    for (cin, cout) in CHANNELS:
        key, k1 = jax.random.split(key)
        if layout == "NHWC":
            w = jax.random.normal(k1, (3, 3, cin, cout), jnp.bfloat16) * 0.1
        else:
            w = jax.random.normal(k1, (cout, cin, 3, 3), jnp.bfloat16) * 0.1
        scale = jnp.ones((cout,), jnp.bfloat16)
        bias = jnp.zeros((cout,), jnp.bfloat16)
        ps.append((w, scale, bias))
    return ps


def forward(params, x, layout):
    if layout == "NHWC":
        dn = jax.lax.conv_dimension_numbers(x.shape, params[0][0].shape, ("NHWC", "HWIO", "NHWC"))
        caxis = 3
    else:
        dn = jax.lax.conv_dimension_numbers(x.shape, params[0][0].shape, ("NCHW", "OIHW", "NCHW"))
        caxis = 1
    i = 0
    for li, (w, scale, bias) in enumerate(params):
        x = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
        # batchnorm (train stats, fp32 accumulation) + relu
        red = tuple(a for a in range(4) if a != caxis)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=red, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=red, keepdims=True)
        x = xf
        shape = [1, 1, 1, 1]
        shape[caxis] = x.shape[caxis]
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        x = x.astype(jnp.bfloat16) * scale.reshape(shape) + bias.reshape(shape)
        x = jax.nn.relu(x)
        if li % 2 == 1 and li < len(params) - 1:  # downsample every 2 convs
            if caxis == 3:
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            else:
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        if layout == "NHWC":
            dnext = i  # silence lints
    return x


def main():
    key = jax.random.PRNGKey(0)
    for layout in ("NHWC", "NCHW"):
        params = make_params(key, layout)
        shape = (24, 224, 224, 1) if layout == "NHWC" else (24, 1, 224, 224)
        x = jax.random.uniform(key, shape, jnp.bfloat16)

        fwd = jax.jit(partial(forward, layout=layout))
        t_f = timeit(lambda p, x: fwd(p, x), params, x)

        def loss(p, x):
            return jnp.sum(forward(p, x, layout).astype(jnp.float32) ** 2) * 1e-30

        g = jax.jit(jax.grad(loss))
        t_fb = timeit(lambda p, x: g(p, x), params, x)
        print(f"{layout}: encoder-stack fwd {t_f:7.2f} ms   fwd+bwd {t_fb:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

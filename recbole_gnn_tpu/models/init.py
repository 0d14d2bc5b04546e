"""Parameter initializers + tiny functional NN helpers.

The framework's "module system" is deliberately minimal: params are
nested dicts of jnp arrays, layers are pure functions.  This keeps
every model a pure function of (params, consts, extras, batch) —
jit/grad/shard_map compose without a module abstraction in the way.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(rng: jax.Array, shape: tuple[int, ...],
                   dtype=jnp.float32) -> jax.Array:
    fan_in, fan_out = shape[0], shape[-1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def xavier_normal(rng: jax.Array, shape: tuple[int, ...],
                  dtype=jnp.float32) -> jax.Array:
    fan_in, fan_out = shape[0], shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(rng, shape, dtype) * std


def uniform_pm(rng: jax.Array, shape: tuple[int, ...], stdv: float,
               dtype=jnp.float32) -> jax.Array:
    return jax.random.uniform(rng, shape, dtype, -stdv, stdv)


def normal_init(rng: jax.Array, shape: tuple[int, ...], std: float = 0.1,
                dtype=jnp.float32) -> jax.Array:
    return jax.random.normal(rng, shape, dtype) * std


def linear_params(rng: jax.Array, d_in: int, d_out: int,
                  init=xavier_uniform, bias: bool = True,
                  stdv: float | None = None) -> dict:
    kw, kb = jax.random.split(rng)
    if stdv is not None:
        w = uniform_pm(kw, (d_in, d_out), stdv)
        b = uniform_pm(kb, (d_out,), stdv) if bias else None
    else:
        w = init(kw, (d_in, d_out))
        b = jnp.zeros((d_out,)) if bias else None
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


def linear(p: dict, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


def split_keys(rng: jax.Array, n: int) -> list[jax.Array]:
    return list(jax.random.split(rng, n))


def l2_normalize(x, eps: float = 1e-12):
    """Smooth L2 row normalization: x·rsqrt(Σx²+ε).

    Unlike x/max(‖x‖, ε), this has a finite gradient at x = 0 — exact
    zero rows (isolated PAD nodes after propagation) otherwise inject
    NaN through the norm's backward even when the value is masked.
    """
    import jax
    import jax.numpy as jnp
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)

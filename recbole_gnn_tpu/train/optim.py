"""Optimizers — functional, pytree-based (replaces torch.optim).

Supports the [recbole] ``learner`` config values the reference trains
with (adam default; sgd/adagrad/rmsprop accepted), plus global-norm
gradient clipping (``clip_grad_norm``) and L2 weight decay added to the
gradients *before* the moment updates — i.e. coupled torch.optim.Adam
semantics, matching what the reference actually runs (NOT decoupled
AdamW; keep it this way for parity).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class Optimizer(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple[Any, Any]]  # (grads, state, params)


def _clip_by_global_norm(grads, max_norm: float):
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def make_optimizer(learner: str = "adam", lr: float = 1e-3,
                   weight_decay: float = 0.0,
                   clip_grad_norm: float | None = None,
                   b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8) -> Optimizer:
    learner = (learner or "adam").lower()

    def preprocess(grads, params):
        if clip_grad_norm:
            grads = _clip_by_global_norm(grads, clip_grad_norm)
        if weight_decay:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params)
        return grads

    if learner == "adam":
        def init(params):
            z = jax.tree_util.tree_map(jnp.zeros_like, params)
            return {"m": z, "v": jax.tree_util.tree_map(jnp.zeros_like, params),
                    "t": jnp.zeros((), jnp.int32)}

        def update(grads, state, params):
            grads = preprocess(grads, params)
            t = state["t"] + 1
            m = jax.tree_util.tree_map(
                lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
            v = jax.tree_util.tree_map(
                lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
            bc1 = 1 - b1 ** t.astype(jnp.float32)
            bc2 = 1 - b2 ** t.astype(jnp.float32)
            new_params = jax.tree_util.tree_map(
                lambda p, m_, v_: p - lr * (m_ / bc1) /
                (jnp.sqrt(v_ / bc2) + eps),
                params, m, v)
            return new_params, {"m": m, "v": v, "t": t}

    elif learner == "sgd":
        def init(params):
            return {}

        def update(grads, state, params):
            grads = preprocess(grads, params)
            return jax.tree_util.tree_map(
                lambda p, g: p - lr * g, params, grads), state

    elif learner == "adagrad":
        def init(params):
            return {"acc": jax.tree_util.tree_map(jnp.zeros_like, params)}

        def update(grads, state, params):
            grads = preprocess(grads, params)
            acc = jax.tree_util.tree_map(
                lambda a, g: a + g * g, state["acc"], grads)
            new_params = jax.tree_util.tree_map(
                lambda p, g, a: p - lr * g / (jnp.sqrt(a) + 1e-10),
                params, grads, acc)
            return new_params, {"acc": acc}

    elif learner == "rmsprop":
        def init(params):
            return {"v": jax.tree_util.tree_map(jnp.zeros_like, params)}

        def update(grads, state, params):
            grads = preprocess(grads, params)
            v = jax.tree_util.tree_map(
                lambda v_, g: 0.99 * v_ + 0.01 * g * g, state["v"], grads)
            new_params = jax.tree_util.tree_map(
                lambda p, g, v_: p - lr * g / (jnp.sqrt(v_) + 1e-8),
                params, grads, v)
            return new_params, {"v": v}

    else:
        raise ValueError(f"unknown learner {learner!r}")

    return Optimizer(init=init, update=update)

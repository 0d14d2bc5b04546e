"""Sharded training step — dp batch sharding + tp row-sharded tables.

The train step is the same pure function the single-chip Trainer jits;
here it is jitted with NamedSharding annotations so GSPMD partitions
it: embedding gathers become all-gathers/all-to-alls over ICI, gradient
reduction becomes psum — no hand-written collectives (SURVEY.md §2.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from recbole_gnn_tpu.parallel.mesh import (
    batch_sharding, embedding_sharding, replicated)


def shard_batch_spec(batch: dict, mesh: Mesh, axis: str = "dp") -> dict:
    """NamedSharding pytree matching a batch dict: leading axis over dp."""
    bs = batch_sharding(mesh, axis)

    def spec(v):
        return bs

    return jax.tree_util.tree_map(spec, batch)


def shard_params_spec(params, mesh: Mesh, table_axis: str = "tp",
                      table_keys: tuple[str, ...] = ("user_emb", "item_emb")):
    """Sharding pytree for params: embedding tables row-sharded over
    ``table_axis``, everything else replicated."""
    emb = embedding_sharding(mesh, table_axis)
    rep = replicated(mesh)

    n_shards = mesh.shape.get(table_axis, 1)

    def walk(node, key=None):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v) for v in node)
        if key in table_keys and hasattr(node, "ndim") and node.ndim == 2:
            if node.shape[0] % n_shards == 0:
                return emb
            # rows must divide the shard count for an explicit placement;
            # odd tables fall back to replication (pad upstream to shard)
            import logging
            logging.getLogger("recbole_gnn_tpu").warning(
                "table %r (%d rows) not divisible by %s=%d — "
                "REPLICATED instead of row-sharded (pad the table to "
                "a shard multiple to regain tp memory scaling)",
                key, node.shape[0], table_axis, n_shards)
        return rep

    return walk(params)


def make_sharded_train_step(model, optimizer, mesh: Mesh, mode: int = 0):
    """Build a jitted train step whose partitioning is driven by the
    *input shardings*: device_put params with row-sharded tables and the
    batch with dp sharding (see place_state/place_batch), and GSPMD
    partitions the step accordingly.

    Returns step(params, opt_state, consts, extras, batch, rng) →
    (params, opt_state, loss)."""

    def step(params, opt_state, consts, extras, batch, rng):
        def loss_fn(p):
            loss, aux = model.calculate_loss(p, consts, extras, batch, rng,
                                             mode=mode)
            return loss, aux

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_opt_state = optimizer.update(grads, opt_state, params)
        return new_params, new_opt_state, loss

    with mesh:
        return jax.jit(step)


def place_state(params, opt_state, mesh: Mesh, table_axis: str = "tp"):
    """device_put params/opt-state with row-sharded embedding tables.
    Adam's m/v mirror the param layout; step counters replicated."""
    spec = shard_params_spec(params, mesh, table_axis)
    params = jax.device_put(params, spec)
    if opt_state is not None:
        rep = replicated(mesh)
        opt_spec = {k: (spec if k in ("m", "v", "acc") else rep)
                    for k in opt_state}
        opt_state = jax.device_put(opt_state, opt_spec)
    return params, opt_state


def place_batch(batch, mesh: Mesh, axis: str = "dp"):
    bs = batch_sharding(mesh, axis)
    return {k: jax.device_put(jnp.asarray(v), bs) for k, v in batch.items()}


def place_epoch_batches(stacked, mesh: Mesh, axis: str = "dp"):
    """Shard a whole-epoch (steps, batch, …) stack directly: axis 0
    (scan steps) replicated, axis 1 (per-step batch) over dp — one
    device_put, no host/device transpose round-trips."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    if axis in mesh.axis_names:
        spec = NamedSharding(mesh, P(None, axis))
    else:
        spec = NamedSharding(mesh, P())
    return {k: jax.device_put(jnp.asarray(v), spec)
            for k, v in stacked.items()}

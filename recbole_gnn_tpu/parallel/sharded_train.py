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


def table_pad_plan(params, mesh: Mesh, table_axis: str = "tp",
                   table_keys: tuple[str, ...] = ("user_emb", "item_emb")
                   ) -> dict[str, tuple[int, int]]:
    """{table key: (logical_rows, padded_rows)} for every 2-D embedding
    table whose rows don't divide the tp shard count.

    Real catalogs are never divisible (VERDICT r2 #3): explicit row
    sharding (NamedSharding P('tp', None)) requires divisibility, so
    tables are padded to the next shard multiple at the TRAIN-STEP
    boundary only — the model always sees the logical table
    (unpad_tables is a static slice inside jit), so losses, reg and
    top-k need no PAD-row masking anywhere.  Pad rows receive zero
    gradient forever (never gathered, not in any graph), so Adam keeps
    them at zero; the checkpoint stores the logical (unpadded) state.
    Empty plan ⇒ nothing to pad (tp absent/1 or already divisible)."""
    n_shards = mesh.shape.get(table_axis, 1)
    plan: dict[str, tuple[int, int]] = {}
    if n_shards <= 1:
        return plan

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if (k in table_keys and hasattr(v, "ndim") and v.ndim == 2
                        and v.shape[0] % n_shards):
                    rows = v.shape[0]
                    plan[k] = (rows, -(-rows // n_shards) * n_shards)
                else:
                    walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return plan


def _map_tables(tree, plan: dict, fn):
    """Apply fn(array, logical, padded) to every planned table leaf."""
    if isinstance(tree, dict):
        return {k: (fn(v, *plan[k]) if k in plan and hasattr(v, "ndim")
                    and v.ndim == 2 else _map_tables(v, plan, fn))
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_map_tables(v, plan, fn) for v in tree)
    return tree


def pad_tables(tree, plan: dict):
    """Zero-pad planned tables to their shard-multiple row count.
    Works on params and on optimizer moments (m/v mirror params; their
    pad rows are correctly zero at any training point since pad rows
    never receive gradient)."""
    if not plan:
        return tree
    return _map_tables(
        tree, plan,
        lambda v, lo, hi: jnp.pad(v, ((0, hi - lo), (0, 0)))
        if v.shape[0] == lo else v)


def unpad_tables(tree, plan: dict):
    """Logical view of padded tables (static slice — jit-safe; GSPMD
    keeps the slice of a row-sharded table sharded)."""
    if not plan:
        return tree
    return _map_tables(
        tree, plan,
        lambda v, lo, hi: v[:lo] if v.shape[0] == hi else v)


def pad_opt_state(opt_state, plan: dict):
    """Pad the param-shaped moment pytrees inside an optimizer state
    (m/v/acc); scalars and step counters pass through."""
    if not plan or opt_state is None:
        return opt_state
    return {k: (pad_tables(v, plan) if k in ("m", "v", "acc") else v)
            for k, v in opt_state.items()}


def make_sharded_train_step(model, optimizer, mesh: Mesh, mode: int = 0,
                            pad_plan: dict | None = None):
    """Build a jitted train step whose partitioning is driven by the
    *input shardings*: device_put params with row-sharded tables and the
    batch with dp sharding (see place_state/place_batch), and GSPMD
    partitions the step accordingly.  With ``pad_plan`` (table_pad_plan)
    the step receives shard-padded tables and the model sees the
    logical slice; gradients w.r.t. the padded params are zero on pad
    rows by construction.

    Returns step(params, opt_state, consts, extras, batch, rng) →
    (params, opt_state, loss)."""
    plan = pad_plan or {}

    def step(params, opt_state, consts, extras, batch, rng):
        def loss_fn(p):
            loss, aux = model.calculate_loss(
                unpad_tables(p, plan), consts, extras, batch, rng,
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

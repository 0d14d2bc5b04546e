"""Device mesh + sharding layout helpers.

Net-new vs the reference (its execution is single-process single-device
— SURVEY.md §2.7); the TPU-native scaling axes are:
  * dp — batch-sharded training steps (gradient all-reduce via GSPMD)
  * tp — row-sharded user/item embedding tables (the only large
    tensors; graphs are replicated or edge-sharded)
Collectives are inserted by XLA/GSPMD from sharding annotations — no
hand-written comms (scaling-book recipe: pick mesh, annotate, let XLA
insert collectives).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: dict | list | None = None,
              devices: list | None = None) -> Mesh:
    """mesh_shape e.g. {'dp': 4, 'tp': 2}; None → all devices on 'dp'.
    A bare size list (CLI shorthand ``--mesh_shape=[4,2]``) gets the
    default axis names dp, tp, pp, sp in order."""
    devices = devices if devices is not None else jax.devices()
    if isinstance(mesh_shape, (list, tuple)):
        names = ("dp", "tp", "pp", "sp")
        if len(mesh_shape) > len(names):
            raise ValueError(f"mesh_shape list longer than {len(names)} "
                             "axes — use the dict form to name axes")
        mesh_shape = {n: int(s) for n, s in zip(names, mesh_shape)}
    if not mesh_shape:
        mesh_shape = {"dp": len(devices)}
    axes = list(mesh_shape.keys())
    sizes = [int(mesh_shape[a]) for a in axes]
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(sizes)
    return Mesh(dev_array, axes)


def embedding_sharding(mesh: Mesh, axis: str = "tp") -> NamedSharding:
    """Row-sharded embedding table layout (N, D) → rows over ``axis``."""
    if axis in mesh.axis_names:
        return NamedSharding(mesh, P(axis, None))
    return NamedSharding(mesh, P())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    if axis in mesh.axis_names:
        return NamedSharding(mesh, P(axis))
    return NamedSharding(mesh, P())

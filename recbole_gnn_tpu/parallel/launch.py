"""Multi-host launch helper — jax.distributed wiring (SURVEY.md §2.7).

No custom transport exists or is needed: each host calls
``init_distributed`` (or relies on TPU pod auto-detection), after which
``jax.devices()`` spans the slice and the existing mesh/sharding code
(parallel/mesh.py, parallel/sharded_train.py) scales unchanged —
collectives are compiled by XLA over ICI/DCN.

Typical pod usage (same command on every host — the init must happen
inside the SAME process that trains, which run.py --distributed does
before any device use):

    python run.py --distributed -m LightGCN -d gowalla \\
        --mesh_shape="{'dp': 16, 'tp': 2}" ...

On non-TPU platforms pass --coordinator_address/--num_processes/
--process_id explicitly (auto-detected on TPU pods).
"""

from __future__ import annotations

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize the JAX distributed runtime.

    On TPU pods all arguments auto-detect from the environment; on other
    platforms pass them explicitly.  Returns the process index."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def global_mesh(mesh_shape: dict | None = None):
    """Mesh over every device in the (possibly multi-host) runtime."""
    from recbole_gnn_tpu.parallel.mesh import make_mesh
    return make_mesh(mesh_shape, devices=jax.devices())

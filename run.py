"""CLI runner (reference: run_recbole_gnn.py:6-15).

Usage:
    python run.py -m LightGCN -d ml-100k --config_files a.yaml,b.yaml \
        [--distributed] [--key=value ...]

--distributed initializes the JAX multi-host runtime (same command on
every host of the pod; coordinator/process args auto-detect on TPU)
BEFORE any device use, so the mesh in ``mesh_shape`` spans the whole
slice.
"""

import argparse

from recbole_gnn_tpu.config.config import parse_cli

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", "-m", type=str, default="LightGCN")
    parser.add_argument("--dataset", "-d", type=str, default="ml-100k")
    parser.add_argument("--config_files", type=str, default=None)
    parser.add_argument("--distributed", action="store_true",
                        help="initialize jax.distributed (multi-host pod)")
    parser.add_argument("--resume", action="store_true",
                        help="continue training from the saved checkpoint "
                             "(params + optimizer + extras at best epoch)")
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args, unknown = parser.parse_known_args()

    config_dict = parse_cli(unknown)

    if args.distributed:
        # must run before quick_start imports touch any device; and if
        # the run is pinned to CPU (use_gpu=False, e.g. the 2-process
        # CI smoke test), the platform must flip BEFORE
        # jax.distributed.initialize probes for a TPU
        if config_dict.get("use_gpu") is False:
            import jax
            jax.config.update("jax_platforms", "cpu")
        from recbole_gnn_tpu.parallel.launch import init_distributed
        init_distributed(coordinator_address=args.coordinator_address,
                         num_processes=args.num_processes,
                         process_id=args.process_id)

    from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu

    config_file_list = (args.config_files.strip().split(",")
                        if args.config_files else None)
    if args.resume:
        config_dict["resume"] = True
    run_recbole_gnn_tpu(model=args.model, dataset=args.dataset,
                        config_file_list=config_file_list,
                        config_dict=config_dict)

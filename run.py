"""CLI runner (reference: run_recbole_gnn.py:6-15).

Usage:
    python run.py -m LightGCN -d ml-100k --config_files a.yaml,b.yaml \
        [--key=value ...]
"""

import argparse

from recbole_gnn_tpu.config.config import parse_cli
from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", "-m", type=str, default="LightGCN")
    parser.add_argument("--dataset", "-d", type=str, default="ml-100k")
    parser.add_argument("--config_files", type=str, default=None)
    args, unknown = parser.parse_known_args()

    config_file_list = (args.config_files.strip().split(",")
                        if args.config_files else None)
    run_recbole_gnn_tpu(model=args.model, dataset=args.dataset,
                        config_file_list=config_file_list,
                        config_dict=parse_cli(unknown))

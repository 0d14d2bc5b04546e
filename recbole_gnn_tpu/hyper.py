"""Grid hyper-parameter tuning (reference: run_hyper.py + [recbole]
HyperTuning with algo='exhaustive').

Params-file format (one line per hyperparameter, [recbole] style):
    learning_rate choice [0.01,0.005,0.001]
    n_layers choice [1,2,3]
Only ``choice`` is meaningful for exhaustive search; ``uniform``/
``loguniform`` lines are sampled on a small fixed grid.
"""

from __future__ import annotations

import itertools

import numpy as np
import yaml

from recbole_gnn_tpu.quick_start import objective_function


def parse_params_file(path: str) -> dict[str, list]:
    space: dict[str, list] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            name, kind, rest = line.split(None, 2)
            if kind == "choice":
                space[name] = list(yaml.safe_load(rest))
            elif kind in ("uniform", "loguniform"):
                lo, hi = yaml.safe_load(rest.replace(" ", ","))[0:2] \
                    if isinstance(yaml.safe_load(rest), list) else (None, None)
                if lo is None:
                    parts = rest.replace(",", " ").split()
                    lo, hi = float(parts[0]), float(parts[1])
                if kind == "uniform":
                    space[name] = list(np.linspace(lo, hi, 5))
                else:
                    space[name] = list(np.logspace(np.log10(lo),
                                                   np.log10(hi), 5))
            else:
                raise ValueError(f"unknown space kind {kind!r}")
    return space


class HyperTuning:
    """Exhaustive grid search with result export."""

    def __init__(self, objective=objective_function, algo: str = "exhaustive",
                 params_file: str | None = None,
                 space: dict[str, list] | None = None,
                 fixed_config_file_list: list[str] | None = None,
                 fixed_config_dict: dict | None = None):
        if algo != "exhaustive":
            raise ValueError("only exhaustive grid search is supported")
        self.objective = objective
        self.space = space or parse_params_file(params_file)
        self.fixed_config_file_list = fixed_config_file_list
        self.fixed_config_dict = dict(fixed_config_dict or {})
        self.params2result: dict[str, dict] = {}
        self.best_params: dict | None = None
        self.best_score: float | None = None
        self.best_result: dict | None = None

    def run(self):
        names = sorted(self.space.keys())
        for combo in itertools.product(*(self.space[n] for n in names)):
            params = dict(zip(names, combo))
            cfg = dict(self.fixed_config_dict)
            cfg.update(params)
            result = self.objective(
                config_dict=cfg,
                config_file_list=self.fixed_config_file_list, saved=False)
            key = str(params)
            self.params2result[key] = result
            score = result["best_valid_score"]
            bigger = result.get("valid_score_bigger", True)
            better = (self.best_score is None or
                      (score > self.best_score if bigger
                       else score < self.best_score))
            if better:
                self.best_score = score
                self.best_params = params
                self.best_result = result
        return self.best_params, self.best_result

    def export_result(self, output_file: str):
        with open(output_file, "w", encoding="utf-8") as f:
            for params, result in self.params2result.items():
                f.write(f"{params}\n")
                f.write(f"Valid result:\n{result['best_valid_result']}\n")
                f.write(f"Test result:\n{result['test_result']}\n\n")

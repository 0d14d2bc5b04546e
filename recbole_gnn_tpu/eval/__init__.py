from recbole_gnn_tpu.eval.metrics import topk_metrics, METRIC_NAMES
from recbole_gnn_tpu.eval.evaluator import Evaluator

__all__ = ["topk_metrics", "METRIC_NAMES", "Evaluator"]

from recbole_gnn_tpu.train.optim import make_optimizer
from recbole_gnn_tpu.train.trainer import Trainer, get_trainer

__all__ = ["make_optimizer", "Trainer", "get_trainer"]

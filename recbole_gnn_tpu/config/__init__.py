from recbole_gnn_tpu.config.config import Config

__all__ = ["Config"]

from recbole_gnn_tpu.parallel.mesh import make_mesh, embedding_sharding
from recbole_gnn_tpu.parallel.sharded_train import (
    make_sharded_train_step, shard_batch_spec)

__all__ = ["make_mesh", "embedding_sharding", "make_sharded_train_step",
           "shard_batch_spec"]

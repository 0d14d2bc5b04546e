"""recbole_gnn_tpu — a TPU-native GNN recommender framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
RecBole-GNN (reference: /root/reference): general, sequential
(session-graph) and social graph recommenders, an atomic-file data
pipeline, a yaml config cascade, negative sampling, a jitted training
loop with early stopping + checkpointing, full-catalog top-k
evaluation, and grid hyper-parameter tuning — all designed TPU-first
(static shapes, segment-op/Pallas SpMM kernels, mesh sharding).
"""

__version__ = "0.1.0"

from recbole_gnn_tpu.quick_start import run_recbole_gnn_tpu, objective_function  # noqa: F401

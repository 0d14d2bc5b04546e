from recbole_gnn_tpu.data.dataset import (
    Dataset,
    GeneralGraphDataset,
    SequentialDataset,
    SessionGraphDataset,
    MultiBehaviorDataset,
    SocialDataset,
)
from recbole_gnn_tpu.data.loader import (
    TrainLoader,
    FullSortEvalLoader,
    NegSampleEvalLoader,
    SequentialTrainLoader,
    SequentialFullSortEvalLoader,
    SequentialNegSampleEvalLoader,
)

__all__ = [
    "Dataset", "GeneralGraphDataset", "SequentialDataset",
    "SessionGraphDataset", "MultiBehaviorDataset", "SocialDataset",
    "TrainLoader", "FullSortEvalLoader", "NegSampleEvalLoader",
    "SequentialTrainLoader", "SequentialFullSortEvalLoader",
    "SequentialNegSampleEvalLoader",
]

from .data import Data
from .batch import Batch
from .graph_batch import GraphBatch
from .compute_edge import (
    chain_criteria_device,
    computeEdgeIndex,
    computeEdgeIndexDevice,
    computeEdgeVector,
    radius_graph_fixed,
)
from .dataset import CondensedDataset
from .dataloader import Collater, DataLoader, getDataIters

__all__ = [
    "Data",
    "Batch",
    "GraphBatch",
    "computeEdgeIndex",
    "computeEdgeVector",
    "radius_graph_fixed",
]

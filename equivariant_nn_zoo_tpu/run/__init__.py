from .loss import Loss, LossStat, SimpleLoss, PerAtomLoss, PerSpeciesLoss, find_loss_function
from .metrics import Metrics, RunningStats
from .early_stopping import EarlyStopping
from .lr_scheduler import ReduceLROnPlateau, CosineAnnealingWarmRestarts
from .trainer import Trainer, TrainerWandB

__all__ = [
    "Loss",
    "LossStat",
    "SimpleLoss",
    "PerAtomLoss",
    "PerSpeciesLoss",
    "find_loss_function",
    "Metrics",
    "RunningStats",
    "EarlyStopping",
    "ReduceLROnPlateau",
    "CosineAnnealingWarmRestarts",
    "Trainer",
    "TrainerWandB",
]

from .loss import Loss, LossStat, SimpleLoss, PerAtomLoss, PerSpeciesLoss, find_loss_function
from .metrics import Metrics, RunningStats
from .early_stopping import EarlyStopping
from .lr_scheduler import ReduceLROnPlateau, CosineAnnealingWarmRestarts
from .trainer import Trainer, TrainerWandB
from .sde_utils import (
    VPSDE,
    get_score_fn,
    get_sde_loss_fn,
    get_step_fn,
    init_sde_state,
)
from . import sde_sampling

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

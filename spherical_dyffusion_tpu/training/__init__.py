from .ema import EmaState, ema_init, ema_update
from .experiments import (
    DYffusionForecastingExperiment,
    ExperimentConfig,
    InterpolationExperiment,
    SimultaneousForecastingExperiment,
)
from .losses import get_loss_fn, lp_loss
from .schedules import get_scheduler, linear_warmup_cosine
from .trainer import Trainer, TrainerConfig, TrainState

__all__ = [
    "EmaState",
    "ema_init",
    "ema_update",
    "DYffusionForecastingExperiment",
    "ExperimentConfig",
    "InterpolationExperiment",
    "SimultaneousForecastingExperiment",
    "get_loss_fn",
    "lp_loss",
    "get_scheduler",
    "linear_warmup_cosine",
    "Trainer",
    "TrainerConfig",
    "TrainState",
]

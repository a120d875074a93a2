from .dyffusion import (
    DiffusionSchedule,
    DYffusionConfig,
    Intermediates,
    build_schedule,
    p_losses,
    predict_x_last,
    q_sample,
    sample_loop,
)

__all__ = [
    "DiffusionSchedule",
    "DYffusionConfig",
    "Intermediates",
    "build_schedule",
    "p_losses",
    "predict_x_last",
    "q_sample",
    "sample_loop",
]

from .dyffusion import (
    DiffusionSchedule,
    DYffusionConfig,
    Intermediates,
    build_schedule,
    p_losses,
    predict_x_last,
    q_sample,
    sample_loop,
    sample_loop_scan,
    scan_compatible,
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
    "sample_loop_scan",
    "scan_compatible",
]

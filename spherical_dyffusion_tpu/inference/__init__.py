from .ace_stepper import (
    SingleStepStepper,
    SingleStepStepperConfig,
    SteppedData,
    ace_scored_names,
    run_ace_inference,
)
from .loop import InferenceConfig, InferenceWindows, run_inference
from .prescriber import NullPrescriber, PackedPrescriber, PrescriberConfig
from .stepper import DYffusionStepper
from .writers import (
    DataWriter,
    DataWriterConfig,
    HistogramWriter,
    PredictionWriter,
    TimeCoarsen,
)

__all__ = [
    "SingleStepStepper",
    "SingleStepStepperConfig",
    "SteppedData",
    "ace_scored_names",
    "run_ace_inference",
    "InferenceConfig",
    "InferenceWindows",
    "run_inference",
    "NullPrescriber",
    "PackedPrescriber",
    "PrescriberConfig",
    "DYffusionStepper",
    "DataWriter",
    "DataWriterConfig",
    "HistogramWriter",
    "PredictionWriter",
    "TimeCoarsen",
]

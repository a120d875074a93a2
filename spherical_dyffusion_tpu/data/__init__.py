from .coords import GridMetadata, HorizontalCoordinates, SigmaCoordinates, VariableMetadata
from .datamodule import DataModuleConfig, DebugDataModule, FV3GFSDataModule, batch_iterator
from .datasets import (
    ConcatSource,
    NetCDFTimeSeries,
    SyntheticTimeSeries,
    WindowedDataset,
)
from .netcdf import NetCDFFile, read_scalar_dataset
from .normalization import StandardNormalizer, get_normalizer
from .packer import Packer

__all__ = [
    "GridMetadata",
    "HorizontalCoordinates",
    "SigmaCoordinates",
    "VariableMetadata",
    "DataModuleConfig",
    "DebugDataModule",
    "FV3GFSDataModule",
    "batch_iterator",
    "ConcatSource",
    "NetCDFTimeSeries",
    "SyntheticTimeSeries",
    "WindowedDataset",
    "NetCDFFile",
    "read_scalar_dataset",
    "StandardNormalizer",
    "get_normalizer",
    "Packer",
]

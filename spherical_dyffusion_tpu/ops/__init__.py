from .sht import RealSHT, InverseRealSHT
from .fft import RealFFT2, InverseRealFFT2
from .contractions import contract, contract_dhconv, contract_diagonal

__all__ = [
    "RealSHT",
    "InverseRealSHT",
    "RealFFT2",
    "InverseRealFFT2",
    "contract",
    "contract_dhconv",
    "contract_diagonal",
]

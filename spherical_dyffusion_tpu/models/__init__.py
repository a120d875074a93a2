from .sfno import SFNO, SFNOConfig
from .unet import UNet, UNetConfig

__all__ = ["SFNO", "SFNOConfig", "UNet", "UNetConfig"]

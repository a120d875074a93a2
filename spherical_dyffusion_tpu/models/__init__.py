from .sfno import SFNO, SFNOConfig

__all__ = ["SFNO", "SFNOConfig"]

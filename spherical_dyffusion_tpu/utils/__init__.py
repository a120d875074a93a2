from .config import apply_dotlist, deep_update, load_config, resolve_interpolations

__all__ = ["apply_dotlist", "deep_update", "load_config", "resolve_interpolations"]

from . import maps

__all__ = ["maps"]

from . import pallas

__all__ = ["pallas"]

from .adapter import PEAAdapter

__all__ = ["PEAAdapter"]

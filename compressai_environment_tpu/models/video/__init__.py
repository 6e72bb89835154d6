from .ssf import ScaleSpaceFlow

__all__ = ["ScaleSpaceFlow"]

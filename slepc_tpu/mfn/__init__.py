from .mfn import MFN

__all__ = ["MFN"]

from .lme import LME

__all__ = ["LME"]

from .svd import SVD

__all__ = ["SVD"]

from .st import ST, STShift, STSinvert, STCayley, STPrecond, STShell
from .filter import STFilter

__all__ = ["ST", "STShift", "STSinvert", "STCayley", "STPrecond", "STFilter", "STShell"]

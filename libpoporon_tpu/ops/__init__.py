from .gf import GF
from .gf2 import gf2_matmul

__all__ = ["GF", "gf2_matmul"]

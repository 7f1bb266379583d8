from .rng import Xoshiro128pp
from . import bits

__all__ = ["Xoshiro128pp", "bits"]

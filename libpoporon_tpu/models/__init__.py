from .rs import RSCodec
from .bch import BCHCodec
from .ldpc import LDPCCodec

__all__ = ["RSCodec", "BCHCodec", "LDPCCodec"]

from .mesh import batch_mesh, shard_batch, distributed_init
from .pipeline import ShardedCodec
from .stats import ber_stats, iteration_histogram

__all__ = [
    "batch_mesh",
    "shard_batch",
    "distributed_init",
    "ShardedCodec",
    "ber_stats",
    "iteration_histogram",
]

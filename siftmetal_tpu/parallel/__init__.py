from .extraction import make_batch_extractor, make_mesh, make_sharded_matcher
from .distributed_ba import make_distributed_ba, shard_ba_problem

__all__ = [
    "make_batch_extractor", "make_mesh", "make_sharded_matcher",
    "make_distributed_ba", "shard_ba_problem",
]

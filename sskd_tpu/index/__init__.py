from sskd_tpu.index.builder import IndexBuilder
from sskd_tpu.index.sharded import ShardedIndex

__all__ = ["IndexBuilder", "ShardedIndex"]

from sskd_tpu.mining.bm25 import BM25Index, build_bm25_index
from sskd_tpu.mining.miners import (
    ANCEMiner,
    BM25Miner,
    TeacherMiner,
    build_mining_curriculum,
)

__all__ = [
    "BM25Index",
    "build_bm25_index",
    "BM25Miner",
    "TeacherMiner",
    "ANCEMiner",
    "build_mining_curriculum",
]

"""sskd_tpu — TPU-native semantic-search + knowledge-distillation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
stack ``Axionis47/semantic-search-kd`` (see SURVEY.md):

- Flax bi-encoder student (e5-small-v2 class) and cross-encoder teacher
  (bge-reranker-large class) with fused attention.
- Score-level KD: 60/20/20 Margin-MSE + listwise KL + InfoNCE with per-step
  temperature annealing 4.0 -> 2.0 (reference: src/kd/losses.py:16-252).
- 3-stage hard-negative mining curriculum: BM25 -> teacher rescoring -> ANCE
  with in-training index refresh (reference: src/mining/miners.py:256-335).
- The FAISS-HNSW index is replaced by an exact Pallas blocked-matmul cosine
  top-k engine over an HBM-resident (optionally int8) matrix, sharded over an
  ICI mesh axis with an all-gather top-k merge.
- A hardened, dependency-free async HTTP serving stack with the reference's
  API surface (reference: src/serve/app.py, middleware.py, schemas.py).
"""

from sskd_tpu.version import __version__

__all__ = ["__version__"]

"""Tensor-parallel parameter sharding for the cross-encoder teacher.

The 560M-param bge-reranker-large teacher fits one v5e chip, but smaller
chips (or co-residency with a large index) may need its matmuls split. The
reference had no TP at all (SURVEY.md 2.10: "optional 2-way TP for teacher
via pjit param sharding" is the planned TPU capability).

Megatron-style layout over one mesh axis:
- attention query/key/value kernels: column-split (head dimension) —
  activations after them are sharded by head;
- attention output kernel: row-split — XLA inserts the all-reduce;
- FFN intermediate kernel: column-split; FFN output kernel: row-split;
- embeddings, layernorms, pooler, classifier head: replicated.

With parameters placed under these NamedShardings, plain ``jax.jit``
propagates the shardings and inserts the collectives — no model-code
changes (XLA SPMD).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_SPLIT_KERNELS = ("query", "key", "value", "intermediate")
ROW_SPLIT_KERNELS = ("output", "ffn_output")


def _spec_for(path: tuple[str, ...], axis: str) -> P:
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    if "kernel" in names:
        parent = names[-2] if len(names) >= 2 else ""
        if parent in COLUMN_SPLIT_KERNELS:
            return P(None, axis)
        if parent in ROW_SPLIT_KERNELS:
            return P(axis, None)
    if "bias" in names:
        parent = names[-2] if len(names) >= 2 else ""
        if parent in COLUMN_SPLIT_KERNELS:
            return P(axis)
    return P()  # replicated: embeddings, norms, row-split biases, heads


def shard_params_tp(params, mesh: Mesh, axis: str = "index"):
    """Place a CrossEncoder/BiEncoder param tree onto ``mesh`` with
    Megatron-style TP over ``axis``. Dimensions must divide the axis size
    (BERT-family hidden/intermediate sizes divide 2/4/8)."""

    def place(path, leaf):
        spec = _spec_for(path, axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def tp_sharding_summary(params) -> dict[str, int]:
    """Count leaves by their placement (diagnostics/tests)."""
    out = {"replicated": 0, "column": 0, "row": 0, "bias_split": 0}

    def visit(path, leaf):
        sharding = leaf.sharding
        spec = getattr(sharding, "spec", None)
        if spec is None or all(s is None for s in (spec or ())) or len(spec) == 0:
            out["replicated"] += 1
        elif len(spec) == 2 and spec[0] is None:
            out["column"] += 1
        elif len(spec) == 2:
            out["row"] += 1
        else:
            out["bias_split"] += 1
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return out

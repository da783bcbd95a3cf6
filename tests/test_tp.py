"""Teacher tensor-parallel sharding: numerical parity with the unsharded
forward and actual distribution of the split matrices (8-device CPU mesh)."""

import numpy as np
import pytest

import jax

from sskd_tpu.models import BertConfig, TeacherModel
from sskd_tpu.parallel.mesh import create_mesh
from sskd_tpu.parallel.tp import shard_params_tp, tp_sharding_summary
from sskd_tpu.tokenization import WordPieceTokenizer

CORPUS = ["machine learning is great", "paris is in france", "query passage"]


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8
    return create_mesh(data_parallel=4, index_parallel=2)


@pytest.fixture(scope="module")
def teacher():
    tok = WordPieceTokenizer.build_from_corpus(CORPUS, vocab_size=256)
    return TeacherModel(
        "tiny-tp",
        config=BertConfig.tiny(vocab_size=tok.vocab_size),
        tokenizer=tok,
    )


def test_tp_forward_parity(teacher, mesh):
    pairs = [("what is ml", "machine learning is great"), ("q", "paris is in france")]
    baseline = teacher.score(pairs)
    sharded = shard_params_tp(teacher.params, mesh, axis="index")
    original = teacher.params
    try:
        teacher.params = sharded
        teacher.cleanup()
        tp_scores = teacher.score(pairs)
    finally:
        teacher.params = original
        teacher.cleanup()
    np.testing.assert_allclose(tp_scores, baseline, atol=1e-4)


def test_tp_actually_splits(teacher, mesh):
    sharded = shard_params_tp(teacher.params, mesh, axis="index")
    summary = tp_sharding_summary(sharded)
    # tiny config: 2 layers x (3 qkv + 1 intermediate) column kernels,
    # 2 x (attn output + ffn output) row kernels
    assert summary["column"] >= 8
    assert summary["row"] >= 4
    assert summary["replicated"] > 0  # norms/embeddings/head stay whole

    # a column-split kernel's per-device shard is half the full matrix
    qk = sharded["params"]["encoder"]["layer_0"]["attention"]["query"]["kernel"]
    shard_shapes = {s.data.shape for s in qk.addressable_shards}
    full = qk.shape
    assert (full[0], full[1] // 2) in shard_shapes


def test_tp_method_on_model(teacher, mesh):
    pairs = [("query one", "machine learning is great")]
    baseline = teacher.score(pairs)
    teacher.shard_tensor_parallel(mesh, axis="index")
    np.testing.assert_allclose(teacher.score(pairs), baseline, atol=1e-4)

"""Fused encode+search: one device dispatch, identical results to the
two-dispatch path."""

import numpy as np
import pytest

from sskd_tpu.index.builder import IndexBuilder
from sskd_tpu.models import BertConfig, StudentModel
from sskd_tpu.serve.fused import FusedSearcher
from sskd_tpu.tokenization import WordPieceTokenizer

DOCS = [f"document about topic {i} with words {i}" for i in range(40)]


@pytest.fixture(scope="module")
def student():
    tok = WordPieceTokenizer.build_from_corpus(
        DOCS + ["query passage what find"], vocab_size=512
    )
    return StudentModel(
        "tiny-fused", config=BertConfig.tiny(vocab_size=tok.vocab_size), tokenizer=tok
    )


@pytest.fixture(scope="module")
def builder(student):
    b = IndexBuilder(embedding_dim=student.embedding_dim, dtype="int8")
    emb = student.encode_documents(DOCS)
    b.build_from_arrays(emb, [f"d{i}" for i in range(len(DOCS))])
    return b


def test_fused_matches_unfused(student, builder):
    fused = FusedSearcher(student, builder)
    queries = ["find topic 3", "find topic 17"]
    fv, fi = fused.search_texts(queries, k=5)
    q_emb = student.encode_queries(queries)
    uv, ui = builder.search(q_emb, k=5)
    np.testing.assert_array_equal(fi, ui)
    np.testing.assert_allclose(fv, uv, atol=1e-4)


def test_fused_k_bucketing_slices(student, builder):
    fused = FusedSearcher(student, builder)
    v, i = fused.search_texts(["find topic 1"], k=3)
    assert v.shape == (1, 3) and i.shape == (1, 3)


def test_fused_warmup_and_cache(student, builder):
    fused = FusedSearcher(student, builder)
    fused.warmup(max_batch=16, k=10)
    assert len(fused._jit_cache) >= 1
    v, i = fused.search_texts(["warm check"], k=10)
    assert v.shape == (1, 10)


def test_serving_uses_fused_with_real_student(tmp_path, monkeypatch, student, builder):
    import sskd_tpu.serve.app as app_module
    from sskd_tpu.config import Settings
    from sskd_tpu.serve.http import TestClient

    builder.texts = [f"text {i}" for i in range(len(DOCS))]
    idx_dir = tmp_path / "idx"
    builder.save(idx_dir)
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: student)
    tc = TestClient(
        app_module.create_app(settings=Settings(), preload_index_dir=str(idx_dir))
    )
    try:
        assert tc.app.state.fused_searcher is not None
        r = tc.post("/search", json_body={"query": "find topic 5", "k": 4})
        assert r.status == 200
        assert r.json()["total_results"] == 4
    finally:
        tc.close()


@pytest.mark.parametrize("dtype", ["int8", "int4"])
def test_fused_keeps_refine_rescore(student, dtype):
    """The recall-margin configs (refine_m > 0 — recommended for int8,
    REQUIRED for int4) must rescore inside the fused dispatch too: fused
    results equal builder.search's refined results, not the raw sweep's
    (the regression this pins: the fused path used to drop the rescore)."""
    b = IndexBuilder(
        embedding_dim=student.embedding_dim,
        dtype=dtype,
        index_type="approx",
        refine_m=16,
    )
    emb = student.encode_documents(DOCS)
    b.build_from_arrays(emb, [f"d{i}" for i in range(len(DOCS))])

    fused = FusedSearcher(student, b)
    queries = ["find topic 3", "find topic 17"]
    fv, fi = fused.search_texts(queries, k=5)
    assert any(key[2] == "refined" for key in fused._jit_cache), (
        "fused dispatch did not route through the refine rescore"
    )
    q_emb = student.encode_queries(queries)
    uv, ui = b.search(q_emb, k=5)
    np.testing.assert_array_equal(fi, ui)
    np.testing.assert_allclose(fv, uv, atol=1e-4)
    # the rescored scores are bf16-exact dots of the TRUE rows, not the
    # quantized sweep's: verify against a host-side rescore of the result
    rows = emb[fi[0]]
    expect = rows.astype(np.float32) @ (
        q_emb[0] / np.linalg.norm(q_emb[0])
    )
    np.testing.assert_allclose(fv[0], expect, atol=2e-2)


@pytest.mark.parametrize("dtype", ["int8", "int4"])
def test_fused_host_refine_storage(student, dtype):
    """refine_storage="host" (adr-012): the fused device program ends at
    the candidate sweep, the rescore runs in numpy after the dispatch, and
    the results match the on-device rescore path."""
    emb = student.encode_documents(DOCS)
    ids = [f"d{i}" for i in range(len(DOCS))]

    def make(storage):
        b = IndexBuilder(
            embedding_dim=student.embedding_dim,
            dtype=dtype,
            index_type="approx",
            refine_m=16,
            refine_storage=storage,
        )
        return b.build_from_arrays(emb, ids)

    host_b = make("host")
    dev_b = make("device")
    fused_host = FusedSearcher(student, host_b)
    fused_dev = FusedSearcher(student, dev_b)
    queries = ["find topic 3", "find topic 17", "words 9"]
    hv, hi = fused_host.search_texts(queries, k=5)
    dv, di = fused_dev.search_texts(queries, k=5)
    assert any(key[2] == "host_refined" for key in fused_host._jit_cache), (
        "fused dispatch did not route through the host-rescore engine"
    )
    assert host_b._device_refine is None  # bf16 rows never reach HBM
    np.testing.assert_array_equal(hi, di)
    np.testing.assert_allclose(hv, dv, atol=5e-3)

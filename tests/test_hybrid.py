"""Hybrid BM25+semantic fusion tests.

The reference *configured* hybrid search (configs/service.yaml:44-49,
feature flags service.yaml:110-113) but shipped no implementation; these
tests pin the real one: RRF/linear fusion math, RM3-lite query expansion,
the serving integration, and graceful degradation when the BM25 arm is
missing."""

from __future__ import annotations

import pytest

import sskd_tpu.serve.app as app_module
from sskd_tpu.config import Settings
from sskd_tpu.mining.bm25 import BM25Index
from sskd_tpu.serve.hybrid import (
    HybridSearcher,
    expand_query,
    linear_fuse,
    rrf_fuse,
)
from sskd_tpu.serve.http import TestClient


# ---------------------------------------------------------------------------
# Fusion math
# ---------------------------------------------------------------------------


class TestRRF:
    def test_exact_scores(self):
        dense = [("a", 0.9), ("b", 0.5)]
        lexical = [("b", 12.0), ("c", 3.0)]
        fused = rrf_fuse([dense, lexical], [0.7, 0.3], rrf_k=60, k=10)
        scores = dict(fused)
        assert scores["a"] == pytest.approx(0.7 / 61)
        assert scores["b"] == pytest.approx(0.7 / 62 + 0.3 / 61)
        assert scores["c"] == pytest.approx(0.3 / 62)
        # b appears in both arms -> ranks first
        assert fused[0][0] == "b"

    def test_k_truncates(self):
        arm = [(f"d{i}", float(10 - i)) for i in range(10)]
        fused = rrf_fuse([arm], [1.0], k=3)
        assert len(fused) == 3
        assert [d for d, _ in fused] == ["d0", "d1", "d2"]

    def test_scale_free(self):
        # multiplying an arm's scores by 1e6 must not change the fusion
        dense = [("a", 0.9), ("b", 0.5)]
        big = [("a", 9e5), ("b", 5e5)]
        lex = [("b", 1.0)]
        f1 = rrf_fuse([dense, lex], [0.7, 0.3])
        f2 = rrf_fuse([big, lex], [0.7, 0.3])
        assert f1 == f2

    def test_mismatched_weights_raise(self):
        with pytest.raises(ValueError):
            rrf_fuse([[("a", 1.0)]], [0.5, 0.5])


class TestLinearFuse:
    def test_minmax_normalization(self):
        dense = [("a", 1.0), ("b", 0.0)]  # normalized: a=1, b=0
        lexical = [("b", 20.0), ("c", 10.0)]  # normalized: b=1, c=0
        fused = dict(linear_fuse([dense, lexical], [0.7, 0.3], k=10))
        assert fused["a"] == pytest.approx(0.7)
        assert fused["b"] == pytest.approx(0.3)
        assert fused["c"] == pytest.approx(0.0)

    def test_constant_arm_scores_to_one(self):
        arm = [("a", 5.0), ("b", 5.0)]
        fused = dict(linear_fuse([arm], [1.0], k=10))
        assert fused["a"] == fused["b"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Query expansion (RM3-lite PRF)
# ---------------------------------------------------------------------------


@pytest.fixture
def bm25_corpus(sample_documents):
    ids = [f"d{i}" for i in range(len(sample_documents))]
    return BM25Index().build(sample_documents, ids)


class TestQueryExpansion:
    def test_appends_terms_from_top_docs(self, bm25_corpus):
        q = "paris france"
        expanded = expand_query(q, bm25_corpus, n_docs=2, n_terms=3)
        assert expanded.startswith(q)
        extra = expanded[len(q) :].split()
        assert 1 <= len(extra) <= 3
        # expansion terms must not repeat query terms
        assert not set(extra) & {"paris", "france"}

    def test_no_hits_returns_query(self, bm25_corpus):
        q = "zzzqqqxxx nonexistent"
        assert expand_query(q, bm25_corpus) == q

    def test_deterministic(self, bm25_corpus):
        q = "neural networks"
        assert expand_query(q, bm25_corpus) == expand_query(q, bm25_corpus)


# ---------------------------------------------------------------------------
# HybridSearcher
# ---------------------------------------------------------------------------


class TestHybridSearcher:
    def test_bad_fusion_method_raises(self, bm25_corpus):
        with pytest.raises(ValueError):
            HybridSearcher(bm25_corpus, fusion_method="borda")

    def test_lexical_dominates_at_full_weight(self, bm25_corpus):
        hs = HybridSearcher(
            bm25_corpus, bm25_weight=1.0, semantic_weight=0.0
        )
        # dense arm deliberately ranks the wrong doc first
        dense = [("d9", 0.99), ("d0", 0.5)]
        fused = hs.fuse("capital of france paris", dense, k=3)
        assert fused[0][0] == "d2"  # "Paris is the capital ... of France."

    def test_fused_contains_both_arms(self, bm25_corpus):
        hs = HybridSearcher(bm25_corpus, bm25_weight=0.3, semantic_weight=0.7)
        dense = [("d9", 0.99)]
        fused = hs.fuse("paris", dense, k=10)
        ids = [d for d, _ in fused]
        assert "d9" in ids  # dense-only candidate survives fusion
        assert any(i in ids for i in ("d2", "d4", "d7"))  # lexical hits


# ---------------------------------------------------------------------------
# Config validation
# ---------------------------------------------------------------------------


class TestHybridConfig:
    def test_weights_must_sum_to_one(self):
        with pytest.raises(Exception):
            Settings.model_validate(
                {
                    "search": {
                        "hybrid": {"bm25_weight": 0.5, "semantic_weight": 0.9}
                    }
                }
            )

    def test_defaults_match_reference_yaml(self):
        # reference: configs/service.yaml:44-49
        s = Settings()
        h = s.search.hybrid
        assert h.enabled is False
        assert h.bm25_weight == pytest.approx(0.3)
        assert h.semantic_weight == pytest.approx(0.7)
        assert h.fusion_method == "rrf"


# ---------------------------------------------------------------------------
# Serving integration
# ---------------------------------------------------------------------------


@pytest.fixture
def bm25_dir(tmp_path, sample_documents):
    ids = [f"d{i}" for i in range(len(sample_documents))]
    idx = BM25Index().build(sample_documents, ids)
    out = tmp_path / "bm25"
    idx.save(out)
    return out


def _make_client(monkeypatch, fake_student, hybrid_settings):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    settings = Settings.model_validate({"search": {"hybrid": hybrid_settings}})
    app = app_module.create_app(settings=settings)
    return TestClient(app)


class TestServingIntegration:
    def test_hybrid_search_end_to_end(
        self, monkeypatch, fake_student, temp_index_dir, bm25_dir
    ):
        tc = _make_client(
            monkeypatch,
            fake_student,
            {
                "enabled": True,
                "bm25_index_path": str(bm25_dir),
                "bm25_weight": 1.0,
                "semantic_weight": 0.0,
            },
        )
        try:
            tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
            r = tc.post(
                "/search",
                json_body={"query": "capital of france paris", "k": 5},
            )
            assert r.status == 200
            body = r.json()
            assert body["hybrid"] is True
            ids = [res["doc_id"] for res in body["results"]]
            assert ids[0] == "d2"  # BM25-dominant fusion surfaces the Paris doc
            # every result carries text (resolved via builder or BM25 store)
            assert all(res["text"] for res in body["results"])
            scores = [res["score"] for res in body["results"]]
            assert scores == sorted(scores, reverse=True)
        finally:
            tc.close()

    def test_hybrid_off_by_default(
        self, monkeypatch, fake_student, temp_index_dir
    ):
        tc = _make_client(monkeypatch, fake_student, {})
        try:
            tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
            r = tc.post("/search", json_body={"query": "paris", "k": 3})
            assert r.status == 200
            assert r.json()["hybrid"] is False
        finally:
            tc.close()

    def test_missing_bm25_arm_degrades_to_dense(
        self, monkeypatch, fake_student, temp_index_dir, tmp_path
    ):
        tc = _make_client(
            monkeypatch,
            fake_student,
            {"enabled": True, "bm25_index_path": str(tmp_path / "nope")},
        )
        try:
            tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
            r = tc.post("/search", json_body={"query": "paris", "k": 3})
            assert r.status == 200  # service degraded, not broken
            assert r.json()["hybrid"] is False
        finally:
            tc.close()

    def test_query_expansion_in_serving(
        self, monkeypatch, fake_student, temp_index_dir, bm25_dir
    ):
        tc = _make_client(
            monkeypatch,
            fake_student,
            {
                "enabled": True,
                "bm25_index_path": str(bm25_dir),
                "query_expansion": True,
            },
        )
        try:
            tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
            r = tc.post("/search", json_body={"query": "france", "k": 5})
            assert r.status == 200
            assert r.json()["hybrid"] is True
        finally:
            tc.close()

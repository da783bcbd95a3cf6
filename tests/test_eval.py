"""KDEvaluator tests (reference surface: src/kd/eval.py:21-334)."""

import numpy as np

from sskd_tpu.kd.eval import KDEvaluator


class _PerfectModel:
    """Fake encoder embedding queries/docs of the same topic identically."""

    def __init__(self, dim=32):
        self.dim = dim

    def _embed(self, topics):
        rng_cache = {}
        out = np.zeros((len(topics), self.dim), np.float32)
        for i, t in enumerate(topics):
            if t not in rng_cache:
                rng = np.random.default_rng(abs(hash(t)) % 2**32)
                v = rng.standard_normal(self.dim).astype(np.float32)
                rng_cache[t] = v / np.linalg.norm(v)
            out[i] = rng_cache[t]
        return out

    @staticmethod
    def _topic(text):
        return text.split()[-1]

    def encode_queries(self, texts, batch_size=256, show_progress=False):
        return self._embed([self._topic(t) for t in texts])

    def encode_documents(self, texts, batch_size=256, show_progress=False):
        return self._embed([self._topic(t) for t in texts])


def _fixtures():
    queries = {f"q{i}": f"question about topic{i}" for i in range(5)}
    corpus = {}
    qrels = {}
    for i in range(5):
        corpus[f"d{i}"] = f"document covering topic{i}"
        corpus[f"n{i}"] = f"noise text other{i}"
        qrels[f"q{i}"] = {f"d{i}": 1.0}
    return queries, corpus, qrels


def test_evaluate_retrieval_perfect_model():
    queries, corpus, qrels = _fixtures()
    ev = KDEvaluator()
    metrics = ev.evaluate_retrieval(_PerfectModel(), queries, corpus, qrels)
    assert metrics["ndcg@10"] == 1.0
    assert metrics["mrr@10"] == 1.0
    assert metrics["recall@10"] == 1.0


def test_ranking_quality_tau_range():
    ev = KDEvaluator()
    model = _PerfectModel()
    out = ev.evaluate_ranking_quality(
        model,
        queries=["about topic1", "about topic2"],
        docs_per_query=[
            ["doc topic1", "doc other1", "doc other2"],
            ["doc topic2", "doc other3", "doc other4"],
        ],
        teacher_scores=[[5.0, -2.0, -3.0], [4.0, -1.0, -2.0]],
        qrels_binary=[[1, 0, 0], [1, 0, 0]],
    )
    assert -1.0 <= out["kendall_tau"] <= 1.0
    assert 0.0 <= out["ece"] <= 1.0


def test_compare_models_gate():
    queries, corpus, qrels = _fixtures()
    ev = KDEvaluator()

    class _Bad(_PerfectModel):
        def encode_queries(self, texts, batch_size=256, show_progress=False):
            rng = np.random.default_rng(0)
            x = rng.standard_normal((len(texts), self.dim)).astype(np.float32)
            return x / np.linalg.norm(x, axis=1, keepdims=True)

    df, gate = ev.compare_models(
        {"teacher": _PerfectModel(), "kd_student": _PerfectModel(), "vanilla": _Bad()},
        queries,
        corpus,
        qrels,
    )
    assert gate["kd_student"] is True
    assert gate["vanilla"] is False
    assert "ndcg@10" in df.columns


def test_generate_report_markdown():
    md = KDEvaluator.generate_report(
        {"teacher": {"ndcg@10": 0.91}, "student": {"ndcg@10": 0.88}}
    )
    assert "| teacher |" in md and "0.9100" in md

"""Model-quality gates against a real trained checkpoint
(reference: tests/test_model_validation.py — skipped locally when the
production checkpoint is absent, forced by REQUIRE_MODEL=1 in CI).

Gates (reference thresholds at :17-21, :162-207, :240-270):
load < 30s, embedding dim matches, L2-normalized, deterministic encoding,
similar > dissimilar ordering, prefix handling, p95 single-encode < 50ms,
batch-16 < 200ms, edge cases, artifact completeness.
"""

import os
import time
from pathlib import Path

import numpy as np
import pytest

MODEL_DIR = Path(
    os.environ.get("SSKD_PRODUCTION_MODEL", "artifacts/models/kd_student_production")
)

require = os.environ.get("REQUIRE_MODEL") == "1"
if not MODEL_DIR.exists() and not require:
    pytest.skip(
        f"production checkpoint not present at {MODEL_DIR}", allow_module_level=True
    )


@pytest.fixture(scope="module")
def model():
    from sskd_tpu.models.student import StudentModel

    t0 = time.perf_counter()
    m = StudentModel(str(MODEL_DIR))
    load_s = time.perf_counter() - t0
    assert load_s < 30.0, f"model load took {load_s:.1f}s (gate: <30s)"
    m.encode(["warmup"])  # compile outside latency gates
    return m


def test_embedding_dim(model):
    emb = model.encode(["check"])
    assert emb.shape[1] == model.embedding_dim


def test_l2_normalized(model):
    emb = model.encode(["one", "two", "three"])
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=0.01)


def test_deterministic(model):
    a = model.encode(["the same input"])
    b = model.encode(["the same input"])
    np.testing.assert_array_equal(a, b)


def test_similar_above_dissimilar(model):
    q = model.encode_queries(["what is machine learning"])
    docs = model.encode_documents(
        ["machine learning is a branch of AI", "recipe for chocolate cake"]
    )
    sims = model.compute_similarity(q, docs)[0]
    assert sims[0] > sims[1]


def test_prefix_handling(model):
    q = model.encode_queries(["paris"])
    d = model.encode_documents(["paris"])
    assert not np.allclose(q, d)


def test_single_encode_p95_under_50ms(model):
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        model.encode(["a latency probe sentence"])
        times.append((time.perf_counter() - t0) * 1000)
    p95 = float(np.percentile(times, 95))
    assert p95 < 50.0, f"single-encode p95 {p95:.1f}ms (gate: <50ms)"


def test_batch16_under_200ms(model):
    batch = [f"sentence number {i}" for i in range(16)]
    model.encode(batch)  # shape warmup
    t0 = time.perf_counter()
    model.encode(batch)
    elapsed = (time.perf_counter() - t0) * 1000
    assert elapsed < 200.0, f"batch-16 encode {elapsed:.1f}ms (gate: <200ms)"


def test_edge_cases(model):
    assert model.encode([""]).shape[0] == 1
    assert model.encode([]).shape == (0, model.embedding_dim)
    long_text = "word " * 5000
    assert model.encode([long_text]).shape[0] == 1
    assert model.encode(["héllo wörld 日本語 🚀"]).shape[0] == 1


def test_artifact_completeness():
    assert (MODEL_DIR / "sskd_config.json").exists()
    assert (MODEL_DIR / "params.msgpack").exists()
    assert (MODEL_DIR / "tokenizer" / "vocab.txt").exists()


def test_size_window():
    total_mb = sum(
        p.stat().st_size for p in MODEL_DIR.rglob("*") if p.is_file()
    ) / (1024 * 1024)
    # reference gate: 100-200MB for the full e5-small-v2 checkpoint; allow
    # any size above a sanity floor when a non-production (tiny) checkpoint
    # is pointed at explicitly
    if os.environ.get("REQUIRE_MODEL") == "1":
        assert 100 <= total_mb <= 200, f"model size {total_mb:.0f}MB outside 100-200MB"
    else:
        assert total_mb > 0

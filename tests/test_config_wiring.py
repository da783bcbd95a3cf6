"""Every config field must be live — these tests pin the wiring of fields
the reference declared but never used (SURVEY.md 7.4 'wire or delete')."""

import numpy as np
import pytest

import sskd_tpu.serve.app as app_module
from sskd_tpu.config import Settings
from sskd_tpu.kd.train import KDTrainer
from sskd_tpu.serve.http import TestClient


def test_save_steps_checkpoints_mid_epoch(tmp_path):
    from sskd_tpu.models import BertConfig, StudentModel
    from sskd_tpu.tokenization import WordPieceTokenizer
    from tests.test_train import _make_samples

    tok = WordPieceTokenizer.build_from_corpus(["alpha beta gamma delta"], vocab_size=256)
    student = StudentModel("t", config=BertConfig.tiny(vocab_size=tok.vocab_size), tokenizer=tok)
    settings = Settings.model_validate(
        {"training": {"epochs": 1, "batch_size": 4, "save_steps": 2,
                      "num_docs_per_query": 4, "early_stopping_patience": 5}}
    )
    trainer = KDTrainer(student, settings)
    trainer.train(_make_samples(16), output_dir=tmp_path / "r", query_len=16, doc_len=16)
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager((tmp_path / "r" / "checkpoints").absolute())
    # 4 steps total, save_steps=2 -> mid-epoch checkpoints at 2 and 4 exist
    steps = set(mgr.all_steps())
    mgr.close()
    assert 2 in steps


def test_early_stopping_metric_loss_ignores_dev(tmp_path):
    from sskd_tpu.models import BertConfig, StudentModel
    from sskd_tpu.tokenization import WordPieceTokenizer
    from tests.test_train import _make_samples

    tok = WordPieceTokenizer.build_from_corpus(["alpha beta gamma delta"], vocab_size=256)
    student = StudentModel("t2", config=BertConfig.tiny(vocab_size=tok.vocab_size), tokenizer=tok)
    settings = Settings.model_validate(
        {"training": {"epochs": 2, "batch_size": 4, "early_stopping_metric": "loss",
                      "num_docs_per_query": 4, "early_stopping_patience": 5,
                      "learning_rate": 0.005}}
    )
    trainer = KDTrainer(student, settings)
    samples = _make_samples(8)
    result = trainer.train(
        samples, dev_samples=samples[:2], output_dir=tmp_path / "r2",
        query_len=16, doc_len=16,
    )
    # dev metric still recorded, but best_metric tracks -loss
    assert "dev_ndcg@10" in result["history"][0]
    assert result["best_metric"] <= 0.0  # -train_loss is negative


def test_rng_impl_reaches_dropout_keys(tmp_path, monkeypatch):
    """training.rng_impl selects the PRNG implementation for the per-step
    dropout keys (rbg = TPU hardware RngBitGenerator, the measured-faster
    default; threefry2x32 = the cross-backend-reproducible JAX default)."""
    from sskd_tpu.models import BertConfig, StudentModel
    from sskd_tpu.tokenization import WordPieceTokenizer
    from tests.test_train import _make_samples

    import jax

    seen: list[str] = []
    real_key = jax.random.key

    def spy(seed, *, impl=None):
        seen.append(impl)
        return real_key(seed, impl=impl)

    monkeypatch.setattr(jax.random, "key", spy)
    tok = WordPieceTokenizer.build_from_corpus(["alpha beta gamma delta"], vocab_size=256)
    student = StudentModel("t3", config=BertConfig.tiny(vocab_size=tok.vocab_size), tokenizer=tok)
    settings = Settings.model_validate(
        {"training": {"epochs": 1, "batch_size": 4, "rng_impl": "threefry2x32",
                      "num_docs_per_query": 4, "early_stopping_patience": 5}}
    )
    KDTrainer(student, settings).train(
        _make_samples(8), output_dir=tmp_path / "r3", query_len=16, doc_len=16
    )
    assert "threefry2x32" in seen

    with pytest.raises(Exception):
        Settings.model_validate({"training": {"rng_impl": "mersenne"}})


def test_search_max_k_enforced(monkeypatch, fake_student, temp_index_dir):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    settings = Settings.model_validate({"search": {"max_k": 5}})
    tc = TestClient(app_module.create_app(settings=settings))
    try:
        tc.post("/index/load", json_body={"index_dir": str(temp_index_dir)})
        assert tc.post("/search", json_body={"query": "q", "k": 5}).status == 200
        r = tc.post("/search", json_body={"query": "q", "k": 6})
        assert r.status == 422
        assert "max_k" in str(r.json())
    finally:
        tc.close()


def test_refine_storage_setting_reaches_loaded_index(
    monkeypatch, tmp_path, fake_student, sample_documents
):
    """SEMANTIC_KD_INDEX__REFINE_STORAGE=host must apply to indexes loaded
    at startup AND via /index/load: the bf16 refine rows stay host-side
    (never staged to a device buffer) and searches still serve the
    recall-margin results (adr-012)."""
    import numpy as np

    from sskd_tpu.index.builder import IndexBuilder

    b = IndexBuilder(
        embedding_dim=384, dtype="int8", index_type="approx", refine_m=8
    )
    emb = fake_student.encode_documents(sample_documents)
    emb = np.asarray(emb) / np.linalg.norm(emb, axis=1, keepdims=True)
    b.build_from_arrays(emb, [f"d{i}" for i in range(len(sample_documents))])
    idx_dir = tmp_path / "idx_refined"
    b.save(idx_dir)

    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    settings = Settings.model_validate({"index": {"refine_storage": "host"}})
    tc = TestClient(
        app_module.create_app(settings=settings, preload_index_dir=str(idx_dir))
    )
    try:
        loaded = tc.app.state.index_builder
        assert loaded.refine_storage == "host"
        assert tc.post("/search", json_body={"query": "q", "k": 3}).status == 200
        assert loaded._refine is not None
        assert loaded._device_refine is None
        # the /index/load route applies the same deployment knob
        r = tc.post("/index/load", json_body={"index_dir": str(idx_dir)})
        assert r.status == 200
        assert tc.app.state.index_builder.refine_storage == "host"
    finally:
        tc.close()


def test_prometheus_path_and_disable(monkeypatch, fake_student):
    monkeypatch.setattr(app_module, "StudentModel", lambda *a, **k: fake_student)
    settings = Settings.model_validate(
        {"monitoring": {"prometheus_path": "/internal/metrics"}}
    )
    tc = TestClient(app_module.create_app(settings=settings))
    try:
        assert tc.get("/internal/metrics").status == 200
        assert tc.get("/metrics").status == 404
    finally:
        tc.close()
    settings = Settings.model_validate({"monitoring": {"prometheus_enabled": False}})
    tc = TestClient(app_module.create_app(settings=settings))
    try:
        assert tc.get("/metrics").status == 404
    finally:
        tc.close()


def test_pooling_cls_changes_embeddings():
    from sskd_tpu.models import BertConfig, StudentModel
    from sskd_tpu.tokenization import WordPieceTokenizer

    tok = WordPieceTokenizer.build_from_corpus(["alpha beta gamma"], vocab_size=256)
    cfg = BertConfig.tiny(vocab_size=tok.vocab_size)
    mean_model = StudentModel("m", config=cfg, tokenizer=tok, pooling="mean")
    cls_model = StudentModel(
        "m", config=cfg, tokenizer=tok, pooling="cls",
        params=mean_model.params,
    )
    a = mean_model.encode(["alpha beta gamma words"])
    b = cls_model.encode(["alpha beta gamma words"])
    assert not np.allclose(a, b)


def test_pooling_persisted_in_checkpoint(tmp_path):
    from sskd_tpu.models import BertConfig, StudentModel
    from sskd_tpu.tokenization import WordPieceTokenizer

    tok = WordPieceTokenizer.build_from_corpus(["alpha beta"], vocab_size=256)
    m = StudentModel("m", config=BertConfig.tiny(vocab_size=tok.vocab_size),
                     tokenizer=tok, pooling="cls")
    m.save(tmp_path / "ck")
    loaded = StudentModel(str(tmp_path / "ck"))
    assert loaded.pooling == "cls"
    np.testing.assert_allclose(
        loaded.encode(["alpha beta"]), m.encode(["alpha beta"]), atol=1e-6
    )

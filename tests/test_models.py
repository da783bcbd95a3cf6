"""Model wrapper contract tests + HF torch -> Flax conversion parity.

Mirrors the reference's StudentModel contract tests (reference:
tests/test_student_model.py — which could only mock the missing module;
here the module is real) and adds the conversion parity the reference
never had (SURVEY.md section 7.3: validate with cosine-parity before
training)."""

import numpy as np
import pytest

from sskd_tpu.models import BertConfig, StudentModel, TeacherModel
from sskd_tpu.tokenization import WordPieceTokenizer

CORPUS = [
    "machine learning is a field of artificial intelligence",
    "paris is the capital of france",
    "python is a programming language",
    "neural networks learn from data",
]


@pytest.fixture(scope="module")
def tiny_tokenizer():
    return WordPieceTokenizer.build_from_corpus(CORPUS + ["query passage what how"], vocab_size=512)


@pytest.fixture(scope="module")
def student(tiny_tokenizer):
    return StudentModel(
        model_name="tiny-test",
        config=BertConfig.tiny(vocab_size=tiny_tokenizer.vocab_size),
        tokenizer=tiny_tokenizer,
    )


@pytest.fixture(scope="module")
def teacher(tiny_tokenizer):
    return TeacherModel(
        model_name="tiny-teacher",
        config=BertConfig.tiny(vocab_size=tiny_tokenizer.vocab_size),
        tokenizer=tiny_tokenizer,
    )


class TestStudentModel:
    def test_bare_string_wrapped(self, student):
        emb = student.encode("a single sentence")
        assert emb.shape == (1, student.embedding_dim)

    def test_embeddings_normalized(self, student):
        emb = student.encode(CORPUS)
        norms = np.linalg.norm(emb, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_deterministic(self, student):
        a = student.encode(CORPUS[:2])
        b = student.encode(CORPUS[:2])
        np.testing.assert_array_equal(a, b)

    def test_prefixes_change_embeddings(self, student):
        plain = student.encode(["paris"])
        q = student.encode_queries(["paris"])
        d = student.encode_documents(["paris"])
        assert not np.allclose(plain, q)
        assert not np.allclose(q, d)

    def test_compute_similarity_shape_range(self, student):
        q = student.encode_queries(CORPUS[:2])
        d = student.encode_documents(CORPUS)
        sim = student.compute_similarity(q, d)
        assert sim.shape == (2, 4)
        assert np.all(sim <= 1.0 + 1e-5) and np.all(sim >= -1.0 - 1e-5)

    def test_batching_invariance(self, student):
        full = student.encode(CORPUS, batch_size=16)
        split = student.encode(CORPUS, batch_size=1)
        np.testing.assert_allclose(full, split, atol=2e-5)

    def test_empty_input(self, student):
        emb = student.encode([])
        assert emb.shape == (0, student.embedding_dim)

    def test_save_load_roundtrip(self, student, tmp_path):
        out = tmp_path / "ckpt"
        student.save(out)
        loaded = StudentModel(model_name=str(out))
        a = student.encode(CORPUS)
        b = loaded.encode(CORPUS)
        np.testing.assert_allclose(a, b, atol=1e-6)
        assert loaded.embedding_dim == student.embedding_dim

    def test_mesh_parallel_encode_parity(self, student):
        import jax

        from sskd_tpu.parallel.mesh import create_mesh

        assert jax.device_count() == 8
        baseline = student.encode(CORPUS)
        mesh = create_mesh(data_parallel=8, index_parallel=1)
        student.set_mesh(mesh)
        try:
            sharded = student.encode(CORPUS)
        finally:
            student.set_mesh(None)
        np.testing.assert_allclose(sharded, baseline, atol=2e-5)

    def test_cleanup(self, student):
        student.encode(["warm"])
        student.cleanup()
        assert student._encode_jit == {}
        # still usable after cleanup
        assert student.encode(["again"]).shape[0] == 1


class TestTeacherModel:
    def test_score_lists_and_tuples(self, teacher):
        pairs_t = [("what is ml", "machine learning is a field")]
        pairs_l = [["what is ml", "machine learning is a field"]]
        st = teacher.score(pairs_t)
        sl = teacher.score(pairs_l)
        assert st == sl
        assert isinstance(st[0], float)

    def test_predict_alias_and_single(self, teacher):
        pairs = [("q", "d"), ("q2", "d2")]
        assert teacher.predict(pairs) == teacher.score(pairs)
        single = teacher.predict_score("q", "d")
        assert single == pytest.approx(teacher.score([("q", "d")])[0])

    def test_batch_size_invariance(self, teacher):
        pairs = [(f"query {i}", f"document text {i}") for i in range(5)]
        a = teacher.score(pairs, batch_size=5)
        b = teacher.score(pairs, batch_size=2)
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_confidence_sigmoid(self, teacher):
        assert teacher.get_confidence(0.0) == pytest.approx(0.5)
        assert teacher.get_confidence(10.0) > 0.99
        assert teacher.get_confidence(-10.0) < 0.01

    def test_empty_pairs(self, teacher):
        assert teacher.score([]) == []

    def test_save_load_roundtrip(self, teacher, tmp_path):
        out = tmp_path / "tckpt"
        teacher.save(out)
        loaded = TeacherModel(model_name=str(out))
        pairs = [("query one", "paris is the capital")]
        np.testing.assert_allclose(loaded.score(pairs), teacher.score(pairs), atol=1e-6)


class TestHFConversionParity:
    """Convert randomly initialized HF torch models and compare forwards.
    This pins the weight mapping so real e5/bge checkpoints convert exactly
    (zero-egress env: random weights exercise the same code path)."""

    def test_bert_encoder_parity(self):
        torch = pytest.importorskip("torch")
        from transformers import BertConfig as HFBertConfig, BertModel

        hf_cfg = HFBertConfig(
            vocab_size=100,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=64,
            type_vocab_size=2,
        )
        torch.manual_seed(0)
        hf_model = BertModel(hf_cfg).eval()

        from sskd_tpu.models.bert import BertEncoder
        from sskd_tpu.models.convert import (
            convert_encoder_params,
            hf_config_to_bert_config,
        )

        cfg = hf_config_to_bert_config(hf_cfg.to_dict())
        params = {"params": convert_encoder_params(hf_model.state_dict(), cfg)}

        rng = np.random.default_rng(0)
        ids = rng.integers(0, 100, (2, 10)).astype(np.int32)
        mask = np.ones((2, 10), np.int32)
        mask[1, 7:] = 0
        ids[1, 7:] = 0

        with torch.no_grad():
            hf_out = hf_model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).last_hidden_state.numpy()

        ours = np.asarray(BertEncoder(cfg).apply(params, ids, mask))
        # compare only unmasked positions (HF computes padded positions too,
        # but their values feed nothing downstream)
        np.testing.assert_allclose(ours[0], hf_out[0], atol=2e-5)
        np.testing.assert_allclose(ours[1, :7], hf_out[1, :7], atol=2e-5)

    def test_xlmr_cross_encoder_parity(self):
        torch = pytest.importorskip("torch")
        from transformers import (
            XLMRobertaConfig,
            XLMRobertaForSequenceClassification,
        )

        hf_cfg = XLMRobertaConfig(
            vocab_size=120,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=66,
            type_vocab_size=1,
            num_labels=1,
            pad_token_id=1,
        )
        torch.manual_seed(1)
        hf_model = XLMRobertaForSequenceClassification(hf_cfg).eval()

        from sskd_tpu.models.bert import CrossEncoder
        from sskd_tpu.models.convert import (
            convert_cross_encoder,
            hf_config_to_bert_config,
        )

        cfg = hf_config_to_bert_config(hf_cfg.to_dict())
        assert cfg.position_style == "roberta"
        params = convert_cross_encoder(hf_model.state_dict(), cfg)

        rng = np.random.default_rng(1)
        ids = rng.integers(2, 120, (3, 12)).astype(np.int32)
        mask = np.ones((3, 12), np.int32)
        mask[2, 8:] = 0
        ids[2, 8:] = 1  # pad token

        with torch.no_grad():
            hf_logits = hf_model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).logits.numpy()[:, 0]

        ours = np.asarray(CrossEncoder(cfg).apply(params, ids, mask))
        np.testing.assert_allclose(ours, hf_logits, atol=2e-5)

"""TeacherTrainer: triple construction, loss decrease, score separation —
the trained-teacher half of the KD ablation (the reference used a
hub-pretrained reranker; this host trains its own, VERDICT round-1 item 1)."""

import json

import numpy as np
import pytest

from sskd_tpu.kd.teacher_train import TeacherTrainer, triples_from_raw
from sskd_tpu.models import BertConfig, TeacherModel
from sskd_tpu.tokenization import WordPieceTokenizer


@pytest.fixture(scope="module")
def raw_jsonl(tmp_path_factory):
    from sskd_tpu.data.demo import generate_demo_dataset

    out = tmp_path_factory.mktemp("demo_raw")
    generate_demo_dataset(out, num_samples=48, splits=("train",), split_fractions=(1.0,))
    return out / "train.jsonl"


class TestTriples:
    def test_labels_and_sources(self, raw_jsonl):
        triples = triples_from_raw(raw_jsonl)
        labels = {lab for _, _, lab in triples}
        assert labels == {0.0, 1.0}
        # positives present for every query
        queries = {q for q, _, _ in triples}
        pos_queries = {q for q, _, lab in triples if lab == 1.0}
        assert pos_queries == queries

    def test_cross_positive_negatives_included(self, raw_jsonl):
        with open(raw_jsonl) as f:
            rows = [json.loads(line) for line in f]
        positives = {
            t
            for r in rows
            for t, s in zip(
                r["passages"]["passage_text"], r["passages"]["is_selected"]
            )
            if s == 1
        }
        triples = triples_from_raw(raw_jsonl, hard_negatives_per_query=0)
        # some negative-labeled pairs use another query's positive passage
        cross = [
            (q, d) for q, d, lab in triples if lab == 0.0 and d in positives
        ]
        assert cross, "no cross-query positive-as-negative pairs generated"

    def test_hard_negatives_are_lexically_close(self, raw_jsonl):
        t_with = triples_from_raw(raw_jsonl, random_negatives_per_query=0,
                                  cross_positive_negatives_per_query=0,
                                  hard_negatives_per_query=2)
        t_without = triples_from_raw(raw_jsonl, random_negatives_per_query=0,
                                     cross_positive_negatives_per_query=0,
                                     hard_negatives_per_query=0)
        assert len(t_with) > len(t_without)


class TestTeacherTrainer:
    def test_loss_decreases_and_scores_separate(self, raw_jsonl):
        triples = triples_from_raw(raw_jsonl)
        texts = sorted({q for q, _, _ in triples} | {d for _, d, _ in triples})
        tok = WordPieceTokenizer.build_from_corpus(texts, vocab_size=1024)
        teacher = TeacherModel(
            "t-test", config=BertConfig.tiny(vocab_size=tok.vocab_size), tokenizer=tok
        )
        result = TeacherTrainer(teacher, learning_rate=1e-3, seed=0).train(
            triples, steps=60, batch_size=32, max_len=48
        )
        assert result["losses"][-1] < result["losses"][0]
        # trained teacher separates positive from negative pairs on average
        pos = [(q, d) for q, d, lab in triples[:200] if lab == 1.0][:20]
        neg = [(q, d) for q, d, lab in triples[:200] if lab == 0.0][:20]
        pos_scores = teacher.score(pos)
        neg_scores = teacher.score(neg)
        assert np.mean(pos_scores) > np.mean(neg_scores)

    def test_rng_impl_honored_and_reproducible(self, raw_jsonl):
        """The dropout-key PRNG impl knob must reach the teacher trainer:
        the demo acceptance gate is calibrated against the threefry draw
        (scripts/run_demo_pipeline.sh pins it), and an ignored knob would
        silently train a different — measured less distillable — teacher."""
        import jax

        triples = triples_from_raw(raw_jsonl)[:64]
        texts = sorted({q for q, _, _ in triples} | {d for _, d, _ in triples})
        tok = WordPieceTokenizer.build_from_corpus(texts, vocab_size=1024)

        def run(impl):
            teacher = TeacherModel(
                "t-rng",
                config=BertConfig.tiny(vocab_size=tok.vocab_size),
                tokenizer=tok,
            )
            TeacherTrainer(teacher, learning_rate=1e-3, seed=0, rng_impl=impl).train(
                triples, steps=4, batch_size=16, max_len=32, eval_frac=0.0
            )
            return jax.tree.leaves(teacher.params)

        a, b, c = run("threefry2x32"), run("threefry2x32"), run("rbg")
        # same impl + seed -> bit-identical weights
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
        # a different impl is a different dropout draw -> different weights
        assert any(not np.array_equal(x, y) for x, y in zip(a, c))

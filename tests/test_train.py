"""Trainer tests: packing, loss-decreases-on-one-batch, checkpoint resume,
and the data-parallel step on the 8-device mesh (the trainer-step and
multi-device tests the reference lacked, SURVEY.md section 4.4)."""

import numpy as np
import pytest

from sskd_tpu.config import Settings
from sskd_tpu.kd.dataset import KDDataset, KDSample
from sskd_tpu.kd.train import KDTrainer
from sskd_tpu.models import BertConfig, StudentModel
from sskd_tpu.tokenization import WordPieceTokenizer

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _make_samples(n=16, n_docs=4, seed=0):
    rng = np.random.default_rng(seed)
    samples = []
    for i in range(n):
        topic = WORDS[i % len(WORDS)]
        query = f"find {topic} info"
        pos = f"{topic} {topic} document about {topic}"
        negs = [
            f"{WORDS[(i + j + 1) % len(WORDS)]} unrelated text"
            for j in range(n_docs - 1)
        ]
        scores = [5.0] + sorted(rng.uniform(-5, 0, n_docs - 1).tolist(), reverse=True)
        samples.append(KDSample(query=query, docs=[pos] + negs, teacher_scores=scores))
    return samples


@pytest.fixture(scope="module")
def tokenizer():
    texts = [" ".join(WORDS), "find info document about unrelated text query passage"]
    return WordPieceTokenizer.build_from_corpus(texts, vocab_size=512)


@pytest.fixture()
def student(tokenizer):
    return StudentModel(
        model_name="tiny-train",
        config=BertConfig.tiny(vocab_size=tokenizer.vocab_size),
        tokenizer=tokenizer,
    )


class TestKDDataset:
    def test_pack_shapes(self, tokenizer):
        ds = KDDataset(_make_samples(8), tokenizer, num_docs=4, query_len=16, doc_len=24)
        batch = next(ds.batches(4, shuffle=False))
        assert batch["query_ids"].shape == (4, 16)
        assert batch["doc_ids"].shape == (4, 4, 24)
        assert batch["doc_valid"].shape == (4, 4)
        assert batch["teacher_scores"].shape == (4, 4)
        assert batch["doc_valid"].all()  # 4 docs per sample, none padded

    def test_doc_padding_marked_invalid(self, tokenizer):
        samples = [KDSample("q", ["only positive"], [1.0])]
        ds = KDDataset(samples, tokenizer, num_docs=4, query_len=8, doc_len=8)
        batch = next(ds.batches(1))
        assert batch["doc_valid"][0].tolist() == [1.0, 0.0, 0.0, 0.0]

    def test_batch_tail_padding(self, tokenizer):
        ds = KDDataset(_make_samples(5), tokenizer, num_docs=2, query_len=8, doc_len=8)
        batches = list(ds.batches(4, shuffle=False))
        assert len(batches) == 2
        # final batch is repeat-padded; padded rows fully invalid
        assert batches[1]["query_ids"].shape[0] == 4
        assert (batches[1]["doc_valid"][-3:] == 0).all()

    def test_drop_last(self, tokenizer):
        ds = KDDataset(_make_samples(5), tokenizer, num_docs=2, query_len=8, doc_len=8)
        assert len(list(ds.batches(4, drop_last=True))) == 1


class TestPrefetchBatches:
    def test_order_and_content_parity(self, tokenizer):
        from sskd_tpu.kd.dataset import prefetch_batches

        ds = KDDataset(_make_samples(13), tokenizer, num_docs=2, query_len=8, doc_len=8)
        sync = list(ds.batches(4, shuffle=True, seed=7))
        pre = list(prefetch_batches(ds.batches(4, shuffle=True, seed=7), size=2))
        assert len(sync) == len(pre)
        for a, b in zip(sync, pre):
            for key in a:
                np.testing.assert_array_equal(a[key], b[key])

    def test_size_zero_is_synchronous_passthrough(self):
        from sskd_tpu.kd.dataset import prefetch_batches

        items = [{"x": np.array([i])} for i in range(5)]
        assert list(prefetch_batches(iter(items), size=0)) == items

    def test_producer_exception_reraises_in_consumer(self):
        from sskd_tpu.kd.dataset import prefetch_batches

        def boom():
            yield {"x": np.zeros(1)}
            raise RuntimeError("pack failed")

        it = prefetch_batches(boom(), size=2)
        next(it)
        with pytest.raises(RuntimeError, match="pack failed"):
            list(it)

    def test_early_break_stops_producer(self):
        import threading

        from sskd_tpu.kd.dataset import prefetch_batches

        produced = []

        def many():
            for i in range(10_000):
                produced.append(i)
                yield {"x": np.array([i])}

        it = prefetch_batches(many(), size=2)
        for _ in range(3):
            next(it)
        it.close()  # abandon mid-stream: must not deadlock or keep producing
        before = len(produced)
        # the producer thread observes the stop event within its 0.1s put
        # timeout; give it a few polls then confirm it has halted
        for _ in range(50):
            if not any(
                t.name == "kd-batch-prefetch" and t.is_alive()
                for t in threading.enumerate()
            ):
                break
            import time

            time.sleep(0.05)
        assert len(produced) <= before + 3  # bounded by queue depth, not 10k


class TestKDTrainer:
    def _settings(self, **training_overrides):
        base = {
            "epochs": 2,
            "batch_size": 4,
            "learning_rate": 5e-3,
            "warmup_ratio": 0.1,
            "early_stopping_patience": 10,
            "num_docs_per_query": 4,
        }
        base.update(training_overrides)
        return Settings.model_validate({"training": base})

    def test_loss_decreases(self, student, tmp_path):
        samples = _make_samples(16)
        trainer = KDTrainer(student, self._settings())
        result = trainer.train(
            samples, output_dir=tmp_path / "run", query_len=16, doc_len=16
        )
        hist = result["history"]
        assert len(hist) == 2
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        assert (tmp_path / "run" / "best_model" / "params.msgpack").exists()
        assert (tmp_path / "run" / "metrics_epoch_1.json").exists()

    def test_temperature_anneals_per_step(self, student, tmp_path):
        trainer = KDTrainer(student, self._settings(epochs=2))
        result = trainer.train(
            _make_samples(8), output_dir=tmp_path / "run2", query_len=16, doc_len=16
        )
        temps = [h["temperature"] for h in result["history"]]
        assert temps[0] > temps[-1]
        assert temps[-1] == pytest.approx(2.0, abs=1e-5)

    def test_dev_metric_early_stopping_field(self, student, tmp_path):
        samples = _make_samples(12)
        trainer = KDTrainer(student, self._settings(epochs=1))
        result = trainer.train(
            samples,
            dev_samples=samples[:4],
            output_dir=tmp_path / "run3",
            query_len=16,
            doc_len=16,
        )
        assert "dev_ndcg@10" in result["history"][0]
        assert 0.0 <= result["history"][0]["dev_ndcg@10"] <= 1.0

    def test_remat_policy_dots_trains(self, student, tmp_path):
        """training.remat_policy='dots' (save matmul outputs, recompute
        only elementwise) must produce a working training run — the
        post-fusion fast path for the KD step."""
        samples = _make_samples(8)
        settings = self._settings(epochs=1)
        settings.training.remat_policy = "dots"
        trainer = KDTrainer(student, settings)
        result = trainer.train(
            samples, output_dir=tmp_path / "run_dots", query_len=16, doc_len=16
        )
        assert np.isfinite(result["history"][0]["train_loss"])

    def test_dev_ndcg_teacher_graded_does_not_saturate(
        self, student, monkeypatch
    ):
        """Binary positive-at-0 nDCG hits 1.0 the moment every positive
        ranks first and stops moving; teacher-graded gains keep
        discriminating on the hard-negative ORDER (VERDICT r3 weak #6).
        Pin: with the positive always ranked first, a student ordering
        that agrees with the teacher over the negatives must score
        strictly higher than one that inverts it — and neither is 1.0
        unless the agreement is exact."""
        trainer = KDTrainer(student, self._settings())
        sample = KDSample(
            query="q",
            docs=["pos", "neg a", "neg b", "neg c"],
            teacher_scores=[5.0, 2.0, 1.0, 0.0],
        )

        def fake_eval(order_scores):
            def encode_queries(texts, **kw):
                return np.ones((len(texts), 1), np.float32)

            def encode_documents(texts, **kw):
                return np.asarray(order_scores, np.float32)[
                    : len(texts)
                ].reshape(-1, 1)

            monkeypatch.setattr(
                trainer.student, "encode_queries", encode_queries
            )
            monkeypatch.setattr(
                trainer.student, "encode_documents", encode_documents
            )
            return trainer._dev_ndcg([sample], trainer.student.params)

        agree = fake_eval([9.0, 3.0, 2.0, 1.0])  # teacher order
        invert = fake_eval([9.0, 1.0, 2.0, 3.0])  # negatives inverted
        assert agree == pytest.approx(1.0)  # exact agreement = 1.0
        assert invert < agree  # binary signal would call these equal
        assert invert < 1.0

    def test_dev_ndcg_positive_placement_dominates_graded_tiebreak(
        self, student, monkeypatch
    ):
        """The graded component is a TIEBREAK, not the signal: a
        checkpoint that keeps the positive first with the negatives
        fully inverted must beat one that ranks a high-teacher-score
        negative above the positive with perfect negative agreement.
        Pure-graded selection violated this when mined near-duplicate
        negatives carried teacher scores close to the positive's — the
        r4 demo-gate failure (KD arm picked a checkpoint testing 0.77
        on qrels where positive-first selection yields ~0.85)."""
        trainer = KDTrainer(student, self._settings())
        # near-duplicate negative: teacher score 4.5 vs positive's 5.0
        sample = KDSample(
            query="q",
            docs=["pos", "near dup", "neg b", "neg c"],
            teacher_scores=[5.0, 4.5, 1.0, 0.0],
        )

        def fake_eval(order_scores):
            def encode_queries(texts, **kw):
                return np.ones((len(texts), 1), np.float32)

            def encode_documents(texts, **kw):
                return np.asarray(order_scores, np.float32)[
                    : len(texts)
                ].reshape(-1, 1)

            monkeypatch.setattr(
                trainer.student, "encode_queries", encode_queries
            )
            monkeypatch.setattr(
                trainer.student, "encode_documents", encode_documents
            )
            return trainer._dev_ndcg([sample], trainer.student.params)

        # positive first, negatives inverted vs teacher
        pos_first = fake_eval([9.0, 1.0, 2.0, 3.0])
        # near-dup negative first (perfect TEACHER agreement otherwise)
        neg_first = fake_eval([8.0, 9.0, 2.0, 1.0])
        assert pos_first > neg_first

    def test_eval_steps_captures_mid_epoch_improvement(
        self, student, tmp_path, monkeypatch
    ):
        """A step-granular dev eval whose peak lands MID-epoch must drive
        best-model selection and early stopping, not just a log line
        (the reference declared eval_steps but never wired it,
        reference: config.py:96-97; SURVEY.md 7.4)."""
        samples = _make_samples(16)  # 4 steps/epoch at batch 4
        # scripted dev metric: step evals see a mid-epoch peak of 0.9 at the
        # 2nd eval; the epoch-end eval sees only 0.3
        scripted = iter([0.5, 0.9, 0.2, 0.1, 0.3])
        monkeypatch.setattr(
            KDTrainer,
            "_dev_ndcg",
            lambda self, dev, params: next(scripted, 0.05),
        )
        trainer = KDTrainer(
            student,
            self._settings(epochs=1, eval_steps=1, early_stopping_patience=1),
        )
        result = trainer.train(
            samples,
            dev_samples=samples[:4],
            output_dir=tmp_path / "steps",
            query_len=16,
            doc_len=16,
        )
        # best metric is the mid-epoch 0.9 peak, not the epoch-end 0.3
        assert result["best_metric"] == pytest.approx(0.9)
        assert (tmp_path / "steps" / "best_model" / "params.msgpack").exists()
        # the step evals are recorded in the history
        evals = result["history"][0]["step_evals"]
        assert [e["step"] for e in evals] == [1, 2, 3, 4]
        assert evals[1]["dev_ndcg@10"] == pytest.approx(0.9)

    def test_eval_steps_mid_epoch_improvement_resets_patience(
        self, student, tmp_path, monkeypatch
    ):
        """patience=1: epoch 1 peaks mid-epoch (must NOT early-stop even
        though the epoch-end value is lower than best), epoch 2 never
        improves (stops). Training must run exactly 2 epochs."""
        samples = _make_samples(8)  # 2 steps/epoch
        scripted = iter([0.5, 0.9, 0.3, 0.1, 0.2, 0.15])
        monkeypatch.setattr(
            KDTrainer,
            "_dev_ndcg",
            lambda self, dev, params: next(scripted, 0.05),
        )
        trainer = KDTrainer(
            student,
            self._settings(epochs=5, eval_steps=1, early_stopping_patience=1),
        )
        result = trainer.train(
            samples,
            dev_samples=samples[:4],
            output_dir=tmp_path / "patience",
            query_len=16,
            doc_len=16,
        )
        assert len(result["history"]) == 2
        assert result["best_metric"] == pytest.approx(0.9)

    def test_eval_steps_use_dev_evaluator_scale(
        self, student, tmp_path, monkeypatch
    ):
        """When a full-corpus ``dev_evaluator`` drives epoch-end selection,
        step-granular evals must go through the SAME evaluator — mixing the
        in-candidate ``_dev_ndcg`` metric into ``best_metric`` would compare
        incompatible scales and corrupt best-model selection."""
        samples = _make_samples(8)  # 2 steps/epoch at batch 4
        calls = []

        def evaluator(model):
            calls.append(1)
            return 0.5

        monkeypatch.setattr(
            KDTrainer,
            "_dev_ndcg",
            lambda self, dev, params: pytest.fail(
                "in-candidate metric used while a dev_evaluator is active"
            ),
        )
        trainer = KDTrainer(student, self._settings(epochs=1, eval_steps=1))
        result = trainer.train(
            samples,
            dev_samples=samples[:4],
            dev_evaluator=evaluator,
            output_dir=tmp_path / "scale",
            query_len=16,
            doc_len=16,
        )
        evals = result["history"][0]["step_evals"]
        assert [e["step"] for e in evals] == [1, 2]
        # 2 step evals + 1 epoch-end eval, all through the one evaluator
        assert len(calls) == 3
        assert result["best_metric"] == pytest.approx(0.5)

    def test_in_batch_negatives_trains(self, student, tmp_path):
        """loss.in_batch_negatives widens the InfoNCE denominator with the
        other queries' docs; the step must still run and reduce the loss."""
        samples = _make_samples(16)
        settings = self._settings()
        settings.loss.in_batch_negatives = True
        trainer = KDTrainer(student, settings)
        result = trainer.train(
            samples, output_dir=tmp_path / "ibn", query_len=16, doc_len=16
        )
        hist = result["history"]
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        # the widened denominator makes the contrastive term larger than
        # the per-query variant at init — sanity that the flag is live
        assert hist[0]["contrastive"] > 0.0

    def test_in_batch_negatives_padded_tail_batch(self, student, tmp_path):
        """A batch-tail padding ROW must not gain extension columns: its
        masked col-0 'positive' would contribute a ~_NEG/B constant to the
        loss (measured: a 1e9/B-scale offset that swamped the gradient
        signal in the demo pipeline). 14 samples at batch 4 -> the last
        batch carries 2 padding rows."""
        samples = _make_samples(14)
        settings = self._settings()
        settings.loss.in_batch_negatives = True
        trainer = KDTrainer(student, settings)
        result = trainer.train(
            samples, output_dir=tmp_path / "ibn_tail", query_len=16, doc_len=16
        )
        hist = result["history"]
        # with the leak, every epoch mean is > 1e8; real losses are O(1-10)
        assert all(h["train_loss"] < 1e3 for h in hist)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]

    def test_resume_from_checkpoint(self, student, tmp_path):
        samples = _make_samples(8)
        out = tmp_path / "resume"
        trainer1 = KDTrainer(student, self._settings(epochs=1))
        r1 = trainer1.train(samples, output_dir=out, query_len=16, doc_len=16)
        assert r1["global_step"] == 2

        student2 = StudentModel(
            model_name="tiny-train",
            config=student.config,
            tokenizer=student.tokenizer,
        )
        trainer2 = KDTrainer(student2, self._settings(epochs=2))
        r2 = trainer2.train(samples, output_dir=out, query_len=16, doc_len=16)
        # resumed at epoch 1, ran only epoch 2
        assert r2["global_step"] == 4
        assert len(r2["history"]) == 1
        assert r2["history"][0]["epoch"] == 2

    def test_ance_refresh_called(self, student, tmp_path):
        samples = _make_samples(8)
        calls = []

        def refresher(current_student):
            calls.append(current_student)
            return _make_samples(8, seed=99)

        settings = self._settings(epochs=3)
        settings.mining.ance_refresh_every_n_steps = 2  # 2 steps/epoch
        trainer = KDTrainer(student, settings)
        trainer.train(
            samples,
            output_dir=tmp_path / "refresh",
            query_len=16,
            doc_len=16,
            negative_refresher=refresher,
        )
        # refresh fires at epoch boundaries 2 and 3
        assert len(calls) == 2
        assert calls[0] is student

    def test_ance_refresh_gated_by_enable_and_warmup(self, student, tmp_path):
        """mining.ance_enabled / ance_warmup_steps (declared-but-dead in the
        reference) actually gate the refresh here."""
        samples = _make_samples(8)

        def run(**mining):
            calls = []
            settings = self._settings(epochs=3)
            settings.mining.ance_refresh_every_n_steps = 2
            for k, v in mining.items():
                setattr(settings.mining, k, v)
            KDTrainer(student, settings).train(
                samples,
                output_dir=tmp_path / f"g{len(str(mining))}{id(mining) % 97}",
                query_len=16,
                doc_len=16,
                negative_refresher=lambda s: calls.append(s) or [],
            )
            return len(calls)

        assert run(ance_enabled=False) == 0
        # warmup 5 > the 4 steps elapsed before the last epoch boundary:
        # only the epoch-3 boundary (step 4 >= ... ) — with 2 steps/epoch,
        # boundaries see global_step 2 and 4; warmup 3 blocks the first
        assert run(ance_warmup_steps=3) == 1

    def _manual_step(self, trainer, student, rng_seed):
        """Build the train step and run it once with a given dropout seed,
        without donating the student's live buffers."""
        import jax
        import jax.numpy as jnp

        ds = KDDataset(
            _make_samples(4), student.tokenizer, num_docs=4, query_len=16, doc_len=16
        )
        batch = next(ds.batches(4, shuffle=False))
        params = jax.tree.map(jnp.copy, student.params)
        opt_state = trainer._tx.init(params)
        _, _, aux = trainer._train_step(
            params, opt_state, batch, jnp.float32(0.0), jax.random.PRNGKey(rng_seed)
        )
        return float(aux["loss"])

    def test_dropout_active_in_train_step(self, student):
        # default tiny config has dropout 0.1 -> different dropout keys give
        # different losses (dropout actually wired, VERDICT round-1 item 2)
        trainer = KDTrainer(student, self._settings())
        trainer._tx = trainer._make_optimizer(10)
        trainer._train_step = trainer._build_train_step()
        losses = {self._manual_step(trainer, student, seed) for seed in (1, 2)}
        assert len(losses) == 2, "dropout keys had no effect on the loss"

    def test_zero_dropout_is_deterministic(self, tokenizer):
        student = StudentModel(
            model_name="tiny-nodrop",
            config=BertConfig.tiny(
                vocab_size=tokenizer.vocab_size,
                hidden_dropout=0.0,
                attention_dropout=0.0,
            ),
            tokenizer=tokenizer,
        )
        trainer = KDTrainer(student, self._settings())
        trainer._tx = trainer._make_optimizer(10)
        trainer._train_step = trainer._build_train_step()
        l1 = self._manual_step(trainer, student, 1)
        l2 = self._manual_step(trainer, student, 2)
        assert l1 == l2

    def test_encode_stays_deterministic(self, student):
        # eval/encode path never sees dropout regardless of config rates
        e1 = student.encode(["alpha beta gamma"])
        e2 = student.encode(["alpha beta gamma"])
        np.testing.assert_array_equal(e1, e2)

    def test_data_parallel_mesh_step(self, student, tmp_path):
        import jax

        from sskd_tpu.parallel.mesh import create_mesh

        assert jax.device_count() == 8
        mesh = create_mesh(data_parallel=8, index_parallel=1)
        trainer = KDTrainer(student, self._settings(epochs=1, batch_size=8), mesh=mesh)
        result = trainer.train(
            _make_samples(16), output_dir=tmp_path / "dp", query_len=16, doc_len=16
        )
        assert len(result["history"]) == 1
        assert np.isfinite(result["history"][0]["train_loss"])

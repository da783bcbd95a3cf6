"""BEIR data path end-to-end on a synthetic BEIR-shaped corpus:
prepare -> integrity -> doc-level eval with MaxSim chunk aggregation
(reference: src/data/prepare.py:137-204, registry.py:13-106;
VERDICT round-1 missing #2)."""

import json

import numpy as np
import pytest

from sskd_tpu.data.integrity import check_dataset_integrity
from sskd_tpu.data.prepare import (
    load_beir_eval,
    prepare_all_datasets,
    prepare_beir_corpus,
    prepare_dataset,
)

TOPICS = [
    ("solar panels", "photovoltaic cells convert sunlight into electricity"),
    ("coral reefs", "marine ecosystems built by colonies of tiny animals"),
    ("jazz music", "improvised rhythms born in new orleans"),
    ("bread baking", "yeast ferments dough into airy loaves"),
    ("glaciers", "slow rivers of compressed ancient ice"),
]


@pytest.fixture(scope="module")
def beir_data_dir(tmp_path_factory):
    """Synthetic BEIR layout for the registered 'fiqa' dataset name."""
    data_dir = tmp_path_factory.mktemp("beir_data")
    raw = data_dir / "raw" / "fiqa"
    (raw / "qrels").mkdir(parents=True)
    with open(raw / "corpus.jsonl", "w") as f:
        for i, (topic, gloss) in enumerate(TOPICS):
            f.write(
                json.dumps(
                    {"_id": f"doc{i}", "title": topic, "text": f"{gloss}. " * 3}
                )
                + "\n"
            )
        # a long doc that must split into multiple chunks
        f.write(
            json.dumps(
                {
                    "_id": "doclong",
                    "title": "history of navigation",
                    "text": "sailors charted the oceans with stars and compasses. " * 80,
                }
            )
            + "\n"
        )
    with open(raw / "queries.jsonl", "w") as f:
        for i, (topic, _) in enumerate(TOPICS):
            f.write(json.dumps({"_id": f"q{i}", "text": f"what is {topic}"}) + "\n")
    with open(raw / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in range(len(TOPICS)):
            f.write(f"q{i}\tdoc{i}\t1\n")
    return data_dir


class TestPrepareBeir:
    def test_corpus_parquet_schema_and_chunking(self, beir_data_dir):
        import pandas as pd

        out = prepare_beir_corpus(beir_data_dir, "fiqa", max_tokens=64, stride=16)
        df = pd.read_parquet(out)
        assert set(df.columns) >= {
            "chunk_id", "doc_id", "title", "text", "tokens", "updated_at",
        }
        assert set(df["doc_id"]) == {f"doc{i}" for i in range(5)} | {"doclong"}
        # the long doc chunks into >1 row; titles are prepended to text
        assert (df["doc_id"] == "doclong").sum() > 1
        assert df["chunk_id"].is_unique

    def test_prepare_dataset_dispatches_beir(self, beir_data_dir):
        manifest = prepare_dataset(beir_data_dir, dataset="fiqa", max_tokens=64, stride=16)
        assert "corpus" in manifest["splits"]
        assert manifest["splits"]["corpus"]["num_chunks"] > 0

    def test_integrity_beir(self, beir_data_dir):
        prepare_dataset(beir_data_dir, dataset="fiqa", max_tokens=64, stride=16)
        report = check_dataset_integrity(beir_data_dir, "fiqa")
        assert report["ok"], report["problems"]

    def test_prepare_all_datasets_tolerates_missing(self, beir_data_dir):
        out = prepare_all_datasets(
            beir_data_dir, datasets=("fiqa", "scifact"), max_tokens=64, stride=16
        )
        assert "fiqa" in out  # raw present
        assert "scifact" not in out  # raw absent -> skipped, not raised


class TestEvalBeir:
    def test_load_and_evaluate(self, beir_data_dir):
        from sskd_tpu.kd.eval import KDEvaluator
        from sskd_tpu.models import BertConfig, StudentModel
        from sskd_tpu.tokenization import WordPieceTokenizer

        prepare_dataset(beir_data_dir, dataset="fiqa", max_tokens=64, stride=16)
        queries, chunks_df, qrels = load_beir_eval(beir_data_dir, "fiqa")
        assert len(queries) == 5 and all(q in qrels for q in queries)

        texts = chunks_df["text"].tolist() + list(queries.values())
        tok = WordPieceTokenizer.build_from_corpus(texts, vocab_size=512)
        student = StudentModel(
            "beir-tiny",
            config=BertConfig.tiny(vocab_size=tok.vocab_size),
            tokenizer=tok,
        )
        metrics = KDEvaluator(k_values=(1, 5)).evaluate_retrieval_chunked(
            student,
            queries,
            chunks_df["text"].tolist(),
            chunks_df["doc_id"].tolist(),
            qrels,
        )
        assert 0.0 <= metrics["ndcg@5"] <= 1.0
        assert "recall@5" in metrics

    def test_maxsim_collapses_duplicate_doc_chunks(self, beir_data_dir):
        """A doc appearing as many chunks occupies ONE slot in the doc
        ranking (MaxSim), not several."""
        import pandas as pd

        from sskd_tpu.kd.eval import KDEvaluator

        prepare_dataset(beir_data_dir, dataset="fiqa", max_tokens=64, stride=16)
        chunks_df = pd.read_parquet(
            beir_data_dir / "chunks" / "fiqa" / "corpus.parquet"
        )

        class FakeModel:
            def encode_documents(self, texts, batch_size=256):
                rng = np.random.default_rng(0)
                e = rng.standard_normal((len(texts), 16)).astype(np.float32)
                return e / np.linalg.norm(e, axis=1, keepdims=True)

            encode_queries = encode_documents

        metrics = KDEvaluator(k_values=(5,)).evaluate_retrieval_chunked(
            FakeModel(),
            {"q0": "anything"},
            chunks_df["text"].tolist(),
            chunks_df["doc_id"].tolist(),
            {"q0": {"doc0": 1.0}},
            fetch_multiplier=20,  # fetch enough chunks to cover the corpus
        )
        # with 6 distinct docs and k=5, metrics must be computable
        assert 0.0 <= metrics["ndcg@5"] <= 1.0

"""BM25 lexical index — Okapi BM25 with the reference's exact parameters and
persistence contract, vectorized with a sparse term-document matrix.

The reference wrapped ``rank_bm25.BM25Okapi`` and scored the FULL corpus per
query in a python loop (reference: src/data/bm25.py:14-259, the stage-1
mining hot loop SURVEY.md section 3.1). This implementation keeps exact
BM25Okapi semantics — k1=1.5, b=0.75, epsilon=0.25 with the
negative-IDF -> epsilon * average_idf fixup (reference: bm25.py:96-98,
SURVEY.md 7.3 "BM25 parity") and lowercase-whitespace tokenization
(reference: bm25.py:33-35) — but scores through scipy CSC column slices, so a
query costs O(nnz of its terms) instead of O(N * |q|).

Persistence is pickle-free JSON + SHA-256 checksum verified on load,
raising on mismatch (reference: bm25.py:79-155, a hardening fix pinned by
tests/test_hardening.py:18-91 there)."""

from __future__ import annotations

import hashlib
import json
import math
from pathlib import Path
from typing import Sequence

import numpy as np

from sskd_tpu.exceptions import ChecksumMismatchError, DataError
from sskd_tpu.utils.logging import get_logger

logger = get_logger("mining.bm25")


def tokenize(text: str) -> list[str]:
    """Lowercase whitespace tokenization (reference: bm25.py:33-35)."""
    return text.lower().split()


class BM25Index:
    K1_DEFAULT = 1.5
    B_DEFAULT = 0.75
    EPSILON_DEFAULT = 0.25

    def __init__(
        self,
        k1: float = K1_DEFAULT,
        b: float = B_DEFAULT,
        epsilon: float = EPSILON_DEFAULT,
    ):
        self.k1 = k1
        self.b = b
        self.epsilon = epsilon
        self.doc_ids: list[str] = []
        self.tokenized_corpus: list[list[str]] = []
        self._built = False

    # ------------------------------------------------------------------

    @property
    def ntotal(self) -> int:
        return len(self.doc_ids)

    def build(self, texts: Sequence[str], doc_ids: Sequence[str]) -> "BM25Index":
        if len(texts) != len(doc_ids):
            raise DataError("texts and doc_ids must align")
        self.doc_ids = [str(d) for d in doc_ids]
        self.tokenized_corpus = [tokenize(t) for t in texts]
        self._fit()
        return self

    def build_from_parquet(
        self,
        parquet_path: str | Path,
        text_column: str = "text",
        id_column: str = "chunk_id",
        max_docs: int | None = None,
    ) -> "BM25Index":
        import pandas as pd

        df = pd.read_parquet(parquet_path, columns=[id_column, text_column])
        if max_docs:
            df = df.head(max_docs)
        return self.build(df[text_column].tolist(), df[id_column].astype(str).tolist())

    def _fit(self) -> None:
        from scipy import sparse

        n_docs = len(self.tokenized_corpus)
        if n_docs == 0:
            raise DataError("empty corpus")
        vocab: dict[str, int] = {}
        rows, cols, data = [], [], []
        doc_lens = np.zeros(n_docs, np.float64)
        df_counts: dict[int, int] = {}
        for di, toks in enumerate(self.tokenized_corpus):
            doc_lens[di] = len(toks)
            counts: dict[int, int] = {}
            for t in toks:
                ti = vocab.setdefault(t, len(vocab))
                counts[ti] = counts.get(ti, 0) + 1
            for ti, c in counts.items():
                rows.append(di)
                cols.append(ti)
                data.append(c)
                df_counts[ti] = df_counts.get(ti, 0) + 1

        n_terms = len(vocab)
        self._vocab = vocab
        self._tf = sparse.csc_matrix(
            (np.asarray(data, np.float64), (rows, cols)), shape=(n_docs, n_terms)
        )
        self._avgdl = float(doc_lens.mean()) if doc_lens.size else 0.0

        # Okapi IDF with epsilon fixup (reference: rank_bm25 semantics,
        # bm25.py:96-98): negative idf -> epsilon * average_idf.
        df_arr = np.zeros(n_terms, np.float64)
        for ti, c in df_counts.items():
            df_arr[ti] = c
        idf = np.log(n_docs - df_arr + 0.5) - np.log(df_arr + 0.5)
        avg_idf = float(idf.mean()) if idf.size else 0.0
        idf = np.where(idf < 0, self.epsilon * avg_idf, idf)
        self._idf = idf
        # per-doc length normalization denominator component
        self._norm = self.k1 * (1.0 - self.b + self.b * doc_lens / max(self._avgdl, 1e-9))
        self._built = True
        logger.info(f"bm25 fit: docs={n_docs} vocab={n_terms} avgdl={self._avgdl:.1f}")

    # ------------------------------------------------------------------

    def get_scores(self, query: str) -> np.ndarray:
        """BM25 scores for every doc (reference: bm25.py:162-192 scored the
        full corpus; here only the query terms' postings are touched)."""
        if not self._built:
            raise DataError("index not built")
        scores = np.zeros(self.ntotal, np.float64)
        for term in tokenize(query):
            ti = self._vocab.get(term)
            if ti is None:
                continue
            col = self._tf.getcol(ti)  # sparse [n_docs, 1]
            docs = col.indices
            tf = col.data
            scores[docs] += (
                self._idf[ti] * tf * (self.k1 + 1.0) / (tf + self._norm[docs])
            )
        return scores

    def search(self, query: str, k: int = 10) -> list[tuple[str, float]]:
        scores = self.get_scores(query)
        k = min(k, self.ntotal)
        top = np.argpartition(-scores, k - 1)[:k]
        top = top[np.argsort(-scores[top])]
        return [(self.doc_ids[i], float(scores[i])) for i in top]

    def batch_search(
        self, queries: Sequence[str], k: int = 10
    ) -> list[list[tuple[str, float]]]:
        return [self.search(q, k) for q in queries]

    def get_doc_text(self, doc_id: str) -> str:
        """Reconstruct text from tokens (reference: bm25.py get_doc_text)."""
        try:
            idx = self.doc_ids.index(doc_id)
        except ValueError:
            raise DataError(f"unknown doc_id {doc_id!r}")
        return " ".join(self.tokenized_corpus[idx])

    # ------------------------------------------------------------------
    # Pickle-free persistence with checksum (reference: bm25.py:79-155)
    # ------------------------------------------------------------------

    @staticmethod
    def _checksum(doc_ids: list[str], corpus: list[list[str]]) -> str:
        h = hashlib.sha256()
        h.update(json.dumps(doc_ids).encode())
        h.update(json.dumps(corpus).encode())
        return h.hexdigest()

    def save(self, output_dir: str | Path) -> Path:
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "doc_ids.json", "w") as f:
            json.dump(self.doc_ids, f)
        with open(out / "tokenized_corpus.json", "w") as f:
            json.dump(self.tokenized_corpus, f)
        with open(out / "bm25_params.json", "w") as f:
            json.dump({"k1": self.k1, "b": self.b, "epsilon": self.epsilon}, f)
        with open(out / "checksum.json", "w") as f:
            json.dump({"sha256": self._checksum(self.doc_ids, self.tokenized_corpus)}, f)
        return out

    @classmethod
    def load(cls, index_dir: str | Path) -> "BM25Index":
        path = Path(index_dir)
        with open(path / "doc_ids.json") as f:
            doc_ids = json.load(f)
        with open(path / "tokenized_corpus.json") as f:
            corpus = json.load(f)
        with open(path / "bm25_params.json") as f:
            params = json.load(f)
        with open(path / "checksum.json") as f:
            expected = json.load(f)["sha256"]
        actual = cls._checksum(doc_ids, corpus)
        if actual != expected:
            raise ChecksumMismatchError(
                "bm25 index corrupted: checksum mismatch",
                details={"expected": expected, "actual": actual},
            )
        idx = cls(**params)
        idx.doc_ids = doc_ids
        idx.tokenized_corpus = corpus
        idx._fit()
        return idx

    @staticmethod
    def exists(index_dir: str | Path) -> bool:
        """All four persistence files present — the staleness check the
        reference got wrong by testing a legacy bm25.pkl
        (reference: scripts/train_kd_pipeline.py:160, SURVEY.md 7.4)."""
        path = Path(index_dir)
        return all(
            (path / name).exists()
            for name in (
                "doc_ids.json",
                "tokenized_corpus.json",
                "bm25_params.json",
                "checksum.json",
            )
        )


def build_bm25_index(
    parquet_path: str | Path,
    output_dir: str | Path,
    text_column: str = "text",
    id_column: str = "chunk_id",
    max_docs: int | None = None,
) -> BM25Index:
    """Build + persist (reference: bm25.py:239-283)."""
    idx = BM25Index().build_from_parquet(
        parquet_path, text_column=text_column, id_column=id_column, max_docs=max_docs
    )
    idx.save(output_dir)
    return idx

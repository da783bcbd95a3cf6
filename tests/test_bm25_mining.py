"""BM25 + miner tests. BM25 is pinned against a direct loop implementation of
Okapi BM25 (k1=1.5, b=0.75, epsilon=0.25) for parity with the reference's
rank_bm25 semantics (SURVEY.md 7.3); miners get the unit tests the reference
never had (SURVEY.md 4.2: 'miners themselves untested!')."""

import hashlib
import math

import numpy as np
import pytest

from sskd_tpu.exceptions import ChecksumMismatchError
from sskd_tpu.mining.bm25 import BM25Index, build_bm25_index, tokenize
from sskd_tpu.mining.miners import (
    ANCEMiner,
    BM25Miner,
    MinedNegatives,
    TeacherMiner,
    build_mining_curriculum,
)

CORPUS_TEXTS = [
    "the cat sat on the mat",
    "dogs chase cats in the yard",
    "quantum physics is hard",
    "the dog barked at the cat",
    "machine learning with python",
]
DOC_IDS = [f"d{i}" for i in range(len(CORPUS_TEXTS))]


def _reference_bm25(corpus_tokens, query_tokens, k1=1.5, b=0.75, epsilon=0.25):
    """Straightforward loop implementation of Okapi BM25 (rank_bm25 math)."""
    n = len(corpus_tokens)
    avgdl = sum(len(d) for d in corpus_tokens) / n
    df = {}
    for doc in corpus_tokens:
        for t in set(doc):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log(n - c + 0.5) - math.log(c + 0.5) for t, c in df.items()}
    avg_idf = sum(idf.values()) / len(idf)
    idf = {t: (v if v >= 0 else epsilon * avg_idf) for t, v in idf.items()}
    scores = []
    for doc in corpus_tokens:
        s = 0.0
        dl = len(doc)
        for t in query_tokens:
            if t not in idf:
                continue
            tf = doc.count(t)
            if tf == 0:
                continue
            s += idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        scores.append(s)
    return np.asarray(scores)


class TestBM25:
    def test_parity_with_loop_implementation(self):
        idx = BM25Index().build(CORPUS_TEXTS, DOC_IDS)
        corpus_tokens = [tokenize(t) for t in CORPUS_TEXTS]
        for query in ["the cat", "dog yard", "python learning", "nonexistent term"]:
            expected = _reference_bm25(corpus_tokens, tokenize(query))
            np.testing.assert_allclose(idx.get_scores(query), expected, rtol=1e-9)

    def test_relevance_ordering(self):
        idx = BM25Index().build(CORPUS_TEXTS, DOC_IDS)
        hits = idx.search("cat mat", k=3)
        assert hits[0][0] == "d0"  # contains both terms
        assert hits[0][1] > hits[1][1]

    def test_save_load_roundtrip(self, tmp_path):
        idx = BM25Index().build(CORPUS_TEXTS, DOC_IDS)
        idx.save(tmp_path / "bm25")
        assert BM25Index.exists(tmp_path / "bm25")
        loaded = BM25Index.load(tmp_path / "bm25")
        np.testing.assert_allclose(
            loaded.get_scores("cat yard"), idx.get_scores("cat yard")
        )
        assert loaded.doc_ids == DOC_IDS

    def test_checksum_corruption_detected(self, tmp_path):
        idx = BM25Index().build(CORPUS_TEXTS, DOC_IDS)
        out = idx.save(tmp_path / "bm25")
        import json

        ids = json.loads((out / "doc_ids.json").read_text())
        ids[0] = "tampered"
        (out / "doc_ids.json").write_text(json.dumps(ids))
        with pytest.raises(ChecksumMismatchError):
            BM25Index.load(out)

    def test_get_doc_text(self):
        idx = BM25Index().build(CORPUS_TEXTS, DOC_IDS)
        assert idx.get_doc_text("d2") == "quantum physics is hard"

    def test_build_from_parquet(self, corpus_parquet, tmp_path):
        idx = build_bm25_index(corpus_parquet, tmp_path / "bm")
        assert idx.ntotal == 10
        assert BM25Index.exists(tmp_path / "bm")


CORPUS = dict(zip(DOC_IDS, CORPUS_TEXTS))


class TestMiners:
    def _bm25(self):
        return BM25Index().build(CORPUS_TEXTS, DOC_IDS)

    def test_bm25_miner_excludes_positives(self):
        miner = BM25Miner(self._bm25(), top_k=3)
        out = miner.mine(["the cat"], [["d0"]])  # d0 is the positive
        assert "d0" not in out[0].doc_ids
        assert len(out[0].doc_ids) <= 3
        assert out[0].scores == [0.0] * len(out[0].doc_ids)

    def test_teacher_miner_threshold_and_order(self, fake_teacher):
        class ScriptedTeacher:
            def score(self, pairs, batch_size=32):
                # d1 strong, d3 weak-positive, d4 below confidence floor
                table = {"dogs chase cats in the yard": 3.0,
                         "the dog barked at the cat": 1.0,
                         "machine learning with python": -5.0}
                return [table[d] for _, d in pairs]

            @staticmethod
            def get_confidence(s):
                return 1 / (1 + math.exp(-s))

        miner = TeacherMiner(ScriptedTeacher(), top_k=5, confidence_threshold=0.6)
        out = miner.mine(["q"], [["d1", "d3", "d4"]], CORPUS)
        assert out[0].doc_ids == ["d1", "d3"]  # sorted desc, d4 filtered
        assert out[0].scores == [3.0, 1.0]

    def test_ance_miner_margin(self, fake_student):
        class ScriptedStudent:
            def encode_queries(self, texts, **kw):
                return np.asarray([[1.0, 0.0]], np.float32)

            def encode_documents(self, texts, **kw):
                table = {
                    "pos": [1.0, 0.0],        # cos 1.0 -> max_pos
                    CORPUS["d1"]: [0.97, 0.24],  # within margin
                    CORPUS["d2"]: [0.5, 0.87],   # outside margin
                }
                return np.asarray([table[t] for t in texts], np.float32)

        miner = ANCEMiner(ScriptedStudent(), margin=0.1, top_k=5)
        out = miner.mine(["q"], [["pos"]], [["d1", "d2"]], CORPUS)
        assert out[0].doc_ids == ["d1"]

    def test_curriculum_stage1(self):
        out = build_mining_curriculum(
            1, ["the cat"], [["the cat sat on the mat"]], CORPUS, self._bm25(),
            positive_ids_per_query=[["d0"]], bm25_top_k=3,
        )
        assert isinstance(out[0], MinedNegatives)
        assert "d0" not in out[0].doc_ids  # positive excluded by id
        assert out[0].scores == [0.0] * len(out[0].doc_ids)

    def test_curriculum_stage2(self, fake_teacher):
        out = build_mining_curriculum(
            2, ["cat yard"], [[]], CORPUS, self._bm25(),
            teacher=fake_teacher, bm25_top_k=4, teacher_top_k=3,
            teacher_confidence_threshold=0.0,
        )
        assert len(out[0].doc_ids) <= 3
        # scores sorted desc (soft labels)
        assert out[0].scores == sorted(out[0].scores, reverse=True)

    def test_curriculum_stage3_union(self, fake_teacher, fake_student):
        out = build_mining_curriculum(
            3, ["cat yard"], [["the cat sat on the mat"]], CORPUS, self._bm25(),
            teacher=fake_teacher, student=fake_student,
            bm25_top_k=4, teacher_confidence_threshold=0.0, ance_margin=2.0,
        )
        res = out[0]
        assert len(res.doc_ids) == len(set(res.doc_ids))  # union, no dupes
        assert len(res.doc_ids) == len(res.scores)

    def test_denoising_drops_near_duplicates(self):
        # candidate d0 is an exact copy of the positive -> dropped
        out = build_mining_curriculum(
            1, ["the cat sat"], [["the cat sat on the mat"]],
            CORPUS, self._bm25(), bm25_top_k=5, denoise_threshold=0.9,
        )
        assert "d0" not in out[0].doc_ids

    def test_stage_validation(self):
        with pytest.raises(ValueError):
            build_mining_curriculum(4, [], [], CORPUS, self._bm25())
        with pytest.raises(ValueError):
            build_mining_curriculum(2, ["q"], [[]], CORPUS, self._bm25())


class PerTextTeacher:
    """Deterministic per-PAIR scores (independent of batch composition) so
    the batched miner can be pinned against the per-query reference path."""

    def __init__(self):
        self.calls = 0

    def score(self, pairs, batch_size=32):
        self.calls += 1
        out = []
        for q, d in pairs:
            h = int(hashlib.sha256(f"{q}|{d}".encode()).hexdigest()[:8], 16)
            out.append(h / 2**32 * 10 - 5)
        return out

    @staticmethod
    def get_confidence(s):
        return 1 / (1 + math.exp(-s))


class PerTextStudent:
    """Deterministic per-TEXT embeddings (independent of batch composition)."""

    def __init__(self):
        self.calls = 0

    def _emb(self, texts, salt):
        self.calls += 1
        out = []
        for t in texts:
            seed = int(hashlib.sha256((salt + t).encode()).hexdigest()[:8], 16)
            v = np.random.default_rng(seed).standard_normal(8).astype(np.float32)
            out.append(v / np.linalg.norm(v))
        return np.stack(out)

    def encode_queries(self, texts, **kw):
        return self._emb(texts, "q:")

    def encode_documents(self, texts, **kw):
        return self._emb(texts, "d:")


class TestBatchedMinerParity:
    """The r2 miners looped per query issuing one device dispatch each
    (the reference's per-query sin, reference: src/mining/miners.py:100-137
    reproduced at the mining layer); the batched rewrite must be
    result-identical while collapsing to O(1) global dispatches."""

    QUERIES = ["the cat", "dog yard", "python maths", "cats and dogs"]
    CANDS = [
        ["d0", "d1", "d3", "missing"],
        ["d1", "d3", "d4"],
        [],  # no candidates -> empty result slot preserved
        ["d0", "d2", "d3", "d4"],
    ]
    POS = [["the cat sat on the mat"], [CORPUS["d1"]], ["py"], []]

    def test_teacher_miner_matches_per_query_reference(self):
        teacher = PerTextTeacher()
        miner = TeacherMiner(teacher, top_k=3, confidence_threshold=0.5)
        got = miner.mine(self.QUERIES, self.CANDS, CORPUS)
        assert teacher.calls == 1  # ONE global cross-query dispatch

        # per-query reference semantics (reference: miners.py:100-137)
        ref_teacher = PerTextTeacher()
        for res, query, cand_ids in zip(got, self.QUERIES, self.CANDS):
            ids = [c for c in cand_ids if c in CORPUS]
            if not ids:
                assert res.doc_ids == [] and res.scores == []
                continue
            scores = ref_teacher.score([(query, CORPUS[c]) for c in ids])
            order = np.argsort(-np.asarray(scores))
            want_ids, want_scores = [], []
            for i in order:
                if len(want_ids) >= 3:
                    break
                if ref_teacher.get_confidence(scores[i]) >= 0.5:
                    want_ids.append(ids[i])
                    want_scores.append(float(scores[i]))
            assert res.doc_ids == want_ids
            np.testing.assert_allclose(res.scores, want_scores, rtol=1e-6)

    def test_ance_miner_matches_per_query_reference(self):
        student = PerTextStudent()
        miner = ANCEMiner(student, margin=0.6, top_k=3)
        got = miner.mine(self.QUERIES, self.POS, self.CANDS, CORPUS)
        # ONE query encode + ONE deduplicated document encode
        assert student.calls == 2

        ref_student = PerTextStudent()
        for res, query, positives, cand_ids in zip(
            got, self.QUERIES, self.POS, self.CANDS
        ):
            ids = [c for c in cand_ids if c in CORPUS]
            if not ids or not positives:
                assert res.doc_ids == [] and res.scores == []
                continue
            q = ref_student.encode_queries([query])
            pos_emb = ref_student.encode_documents(list(positives))
            cand_emb = ref_student.encode_documents([CORPUS[c] for c in ids])
            max_pos = float((q @ pos_emb.T).max())
            cand_scores = (q @ cand_emb.T)[0]
            eligible = [
                (float(s), c)
                for s, c in zip(cand_scores, ids)
                if s >= max_pos - 0.6
            ]
            eligible.sort(key=lambda t: -t[0])
            picked = eligible[:3]
            assert res.doc_ids == [c for _, c in picked]
            np.testing.assert_allclose(
                res.scores, [s for s, _ in picked], rtol=1e-5
            )

    def test_ance_dedup_shares_texts_across_queries(self):
        # two queries share candidate d1; the global batch encodes it once
        student = PerTextStudent()
        seen: list[int] = []
        orig = student.encode_documents

        def spy(texts, **kw):
            seen.append(len(texts))
            return orig(texts, **kw)

        student.encode_documents = spy
        ANCEMiner(student, margin=2.0, top_k=5).mine(
            ["q1", "q2"],
            [["p"], ["p"]],
            [["d1", "d2"], ["d1", "d3"]],
            CORPUS,
        )
        # unique texts: p, d1, d2, d3 -> 4 (not 1+2 + 1+2 = 6 per-query)
        assert seen == [4]

"""Hybrid lexical+semantic retrieval with rank fusion and PRF expansion.

The reference *configured* hybrid search but never implemented it: the
``hybrid:`` block (bm25 path, 0.3/0.7 weights, ``fusion_method: rrf``) and
the ``enable_hybrid`` / ``enable_query_expansion`` feature flags exist only
in YAML (reference: configs/service.yaml:44-49,110-113 — no consumer
anywhere under ``src/``). This module makes both features real:

- **Reciprocal-rank fusion** (``fusion_method: "rrf"``):
  ``score(d) = sum_arm  w_arm / (rrf_k + rank_arm(d))`` with 1-based ranks;
  documents absent from an arm simply contribute nothing from it. RRF is
  scale-free, so BM25's unbounded scores and cosine's [-1, 1] need no
  calibration.
- **Linear fusion** (``fusion_method: "linear"``): per-arm min-max score
  normalization to [0, 1] followed by the weighted sum — the reference
  YAML's alternative method.
- **RM3-lite query expansion**: score terms of the top BM25 documents by
  tf x idf, append the best non-query terms to the *lexical* arm's query.
  Expansion deliberately does NOT touch the dense arm — a bi-encoder embeds
  the natural-language query; concatenating PRF terms shifts it off the
  training distribution.

Everything here is host-side list math on the candidate sets (tens to
hundreds of entries) — the device work stays in the dense engine.
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

from sskd_tpu.mining.bm25 import BM25Index, tokenize

Ranked = Sequence[tuple[str, float]]  # (doc_id, score) in rank order


def rrf_fuse(
    arms: Sequence[Ranked],
    weights: Sequence[float],
    rrf_k: int = 60,
    k: int = 10,
) -> list[tuple[str, float]]:
    """Weighted reciprocal-rank fusion of ranked lists.

    ``rrf_k`` dampens the head-vs-tail gap (Cormack et al.'s 60 default).
    """
    if len(arms) != len(weights):
        raise ValueError("arms and weights must align")
    fused: dict[str, float] = {}
    for arm, w in zip(arms, weights):
        for rank, (doc_id, _score) in enumerate(arm, start=1):
            fused[doc_id] = fused.get(doc_id, 0.0) + w / (rrf_k + rank)
    ordered = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered[:k]


def _minmax(scores: Sequence[float]) -> list[float]:
    if not scores:
        return []
    lo, hi = min(scores), max(scores)
    if hi - lo < 1e-12:
        return [1.0] * len(scores)
    return [(s - lo) / (hi - lo) for s in scores]


def linear_fuse(
    arms: Sequence[Ranked],
    weights: Sequence[float],
    k: int = 10,
) -> list[tuple[str, float]]:
    """Min-max-normalized weighted linear combination of scored lists."""
    if len(arms) != len(weights):
        raise ValueError("arms and weights must align")
    fused: dict[str, float] = {}
    for arm, w in zip(arms, weights):
        normed = _minmax([s for _, s in arm])
        for (doc_id, _), ns in zip(arm, normed):
            fused[doc_id] = fused.get(doc_id, 0.0) + w * ns
    ordered = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered[:k]


def expand_query(
    query: str,
    bm25: BM25Index,
    n_docs: int = 3,
    n_terms: int = 5,
) -> str:
    """RM3-lite pseudo-relevance feedback: append the ``n_terms`` highest
    tf x idf terms from the top ``n_docs`` BM25 hits that are not already
    in the query. Returns the expanded query string (original query
    unchanged when nothing useful is found)."""
    # zero-score "hits" are docs the query never touched — no PRF evidence
    hits = [(d, s) for d, s in bm25.search(query, k=n_docs) if s > 0.0]
    if not hits:
        return query
    q_terms = set(tokenize(query))
    tf: Counter[str] = Counter()
    pos_by_id = {d: i for i, d in enumerate(bm25.doc_ids)}
    for doc_id, _ in hits:
        idx = pos_by_id.get(doc_id)
        if idx is None:
            continue
        tf.update(t for t in bm25.tokenized_corpus[idx] if t not in q_terms)
    if not tf:
        return query
    scored = []
    for term, count in tf.items():
        ti = bm25._vocab.get(term)
        idf = float(bm25._idf[ti]) if ti is not None else 0.0
        scored.append((count * idf, term))
    scored.sort(key=lambda x: (-x[0], x[1]))
    extra = [t for _, t in scored[:n_terms]]
    return query + " " + " ".join(extra) if extra else query


class HybridSearcher:
    """Fuses the dense engine's candidates with a BM25 arm over the same
    corpus. Construct once at service startup from the loaded
    :class:`BM25Index`; ``fuse`` is called per request with the dense
    candidates already retrieved."""

    def __init__(
        self,
        bm25: BM25Index,
        bm25_weight: float = 0.3,
        semantic_weight: float = 0.7,
        fusion_method: str = "rrf",
        rrf_k: int = 60,
        query_expansion: bool = False,
        expansion_docs: int = 3,
        expansion_terms: int = 5,
    ):
        if fusion_method not in ("rrf", "linear"):
            raise ValueError(f"unknown fusion_method {fusion_method!r}")
        self.bm25 = bm25
        self.bm25_weight = bm25_weight
        self.semantic_weight = semantic_weight
        self.fusion_method = fusion_method
        self.rrf_k = rrf_k
        self.query_expansion = query_expansion
        self.expansion_docs = expansion_docs
        self.expansion_terms = expansion_terms

    def lexical_arm(self, query: str, k: int) -> list[tuple[str, float]]:
        if self.query_expansion:
            query = expand_query(
                query, self.bm25, self.expansion_docs, self.expansion_terms
            )
        return self.bm25.search(query, k=k)

    def fuse(
        self,
        query: str,
        dense: Ranked,
        k: int,
    ) -> list[tuple[str, float]]:
        """Fuse dense candidates with the BM25 arm; returns top-``k``
        (doc_id, fused_score). The lexical arm fetches as many candidates
        as the dense arm supplied so both rankings have equal depth."""
        lexical = self.lexical_arm(query, k=max(k, len(dense)))
        arms = [list(dense), lexical]
        weights = [self.semantic_weight, self.bm25_weight]
        if self.fusion_method == "rrf":
            return rrf_fuse(arms, weights, rrf_k=self.rrf_k, k=k)
        return linear_fuse(arms, weights, k=k)

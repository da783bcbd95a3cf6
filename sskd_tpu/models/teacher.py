"""TeacherModel — cross-encoder wrapper with the reference's contract.

Implements the reconstructed API of the reference's missing
``src/models/teacher.py`` (SURVEY.md section 2.4): ``score(pairs,
batch_size) -> list[float]`` raw logits roughly [-10, 10]
(reference: docs/decisions/adr-004:9), ``predict`` alias, single-pair
``predict_score``, and ``get_confidence(score) -> [0, 1]`` used as the
stage-2 mining threshold (reference: src/mining/miners.py:148).

The forward pass is a jitted Flax cross-encoder (bge-reranker-large class:
XLM-RoBERTa-large + scalar head) over host-tokenized [CLS] q [SEP] d [SEP]
pairs, batched in bf16 on the MXU — teacher rescoring dominates mining cost
(reference: docs/overview/results-and-benchmarks.md:68), so throughput here
is budgeted explicitly (SURVEY.md section 7.3).
"""

from __future__ import annotations

import json
import math
from functools import partial
from pathlib import Path
from typing import Sequence

import numpy as np

from sskd_tpu.models.bert import BertConfig, CrossEncoder
from sskd_tpu.models.student import bucket_length
from sskd_tpu.tokenization import WordPieceTokenizer, get_default_tokenizer
from sskd_tpu.utils.logging import get_logger

logger = get_logger("models.teacher")


class TeacherModel:
    """Cross-encoder teacher (bge-reranker-large class)."""

    def __init__(
        self,
        model_name: str | None = None,
        device: str | None = None,
        config: BertConfig | None = None,
        tokenizer: WordPieceTokenizer | None = None,
        params=None,
        max_seq_length: int = 512,
        seed: int = 0,
    ):
        import jax

        self.model_name = model_name or "BAAI/bge-reranker-large"
        try:
            self.device = device or jax.devices()[0].platform
        except RuntimeError:
            self.device = "cpu"
        self.max_seq_length = max_seq_length

        loaded = False
        if model_name and Path(model_name).is_dir():
            path = Path(model_name)
            if (path / "sskd_config.json").exists():
                self._load_own_checkpoint(path)
                loaded = True
            elif (path / "config.json").exists():
                self._load_hf_checkpoint(path)
                loaded = True
        if not loaded:
            self.config = config or (
                BertConfig.bge_reranker_large()
                if "reranker" in self.model_name
                else BertConfig.tiny()
            )
            self.tokenizer = tokenizer or get_default_tokenizer()
            self.module = CrossEncoder(self.config)
            dummy = np.zeros((1, 8), np.int32)
            self.params = self.module.init(
                jax.random.PRNGKey(seed), dummy, np.ones_like(dummy)
            )
            logger.warning(
                f"no local weights for {self.model_name!r}; random init "
                f"({self.config.num_layers}L/{self.config.hidden_size}H)"
            )
        if tokenizer is not None:
            self.tokenizer = tokenizer
        if params is not None:
            self.params = params
        self._score_jit = {}

    def _load_own_checkpoint(self, path: Path) -> None:
        from flax import serialization
        import jax

        with open(path / "sskd_config.json") as f:
            meta = json.load(f)
        arch = meta["architecture"]
        arch.pop("compute_dtype", None)
        self.config = BertConfig(**arch)
        self.max_seq_length = meta.get("max_seq_length", 512)
        self.tokenizer = WordPieceTokenizer.from_pretrained_dir(path / "tokenizer")
        self.module = CrossEncoder(self.config)
        dummy = np.zeros((1, 8), np.int32)
        template = self.module.init(jax.random.PRNGKey(0), dummy, np.ones_like(dummy))
        with open(path / "params.msgpack", "rb") as f:
            self.params = serialization.from_bytes(template, f.read())
        logger.info(f"loaded teacher checkpoint from {path}")

    def _load_hf_checkpoint(self, path: Path) -> None:
        from sskd_tpu.models.convert import (
            convert_cross_encoder,
            hf_config_to_bert_config,
            load_hf_checkpoint,
        )

        sd, hf_cfg = load_hf_checkpoint(path)
        self.config = hf_config_to_bert_config(hf_cfg)
        self.params = convert_cross_encoder(sd, self.config)
        self.module = CrossEncoder(self.config)
        vocab = path / "vocab.txt"
        self.tokenizer = (
            WordPieceTokenizer.from_pretrained_dir(path)
            if vocab.exists()
            else get_default_tokenizer()
        )
        logger.info(f"converted HF teacher checkpoint from {path}")

    def save(self, path: str | Path) -> Path:
        from flax import serialization

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        arch = {
            k: getattr(self.config, k)
            for k in (
                "vocab_size",
                "hidden_size",
                "num_layers",
                "num_heads",
                "intermediate_size",
                "max_position_embeddings",
                "type_vocab_size",
                "layer_norm_eps",
                "hidden_dropout",
                "attention_dropout",
                "pad_token_id",
                "position_style",
            )
        }
        with open(path / "sskd_config.json", "w") as f:
            json.dump(
                {
                    "model_name": self.model_name,
                    "architecture": arch,
                    "max_seq_length": self.max_seq_length,
                },
                f,
                indent=2,
            )
        with open(path / "params.msgpack", "wb") as f:
            f.write(serialization.to_bytes(self.params))
        self.tokenizer.save(path / "tokenizer")
        return path

    # ------------------------------------------------------------------
    # Scoring
    # ------------------------------------------------------------------

    def _score_fn(self, length: int):
        import jax

        if length not in self._score_jit:

            @partial(jax.jit)
            def fn(params, input_ids, attention_mask, token_type_ids):
                return self.module.apply(
                    params, input_ids, attention_mask, token_type_ids
                )

            self._score_jit[length] = fn
        return self._score_jit[length]

    def score(
        self,
        pairs: Sequence[Sequence[str]],
        batch_size: int = 32,
        show_progress: bool = False,
    ) -> list[float]:
        """Raw relevance logits for (query, doc) pairs; accepts lists or
        tuples (reference call sites: miners.py:135-137, serve/app.py:325-326)."""
        pairs = [tuple(p) for p in pairs]
        if not pairs:
            return []
        out: list[float] = []
        # double-buffer (same pattern as StudentModel.encode): tokenize +
        # dispatch chunk i+1 before pulling chunk i so host tokenization
        # overlaps the device's cross-encoder forward — mining scores
        # thousands of pairs through here.
        pending = None
        for start in range(0, len(pairs), batch_size):
            chunk = pairs[start : start + batch_size]
            queries = [q for q, _ in chunk]
            docs = [d for _, d in chunk]
            longest = 3 + max(
                len(self.tokenizer.tokenize(q)) + len(self.tokenizer.tokenize(d))
                for q, d in chunk
            )
            length = bucket_length(longest, self.max_seq_length)
            batch = self.tokenizer.encode_batch(
                queries, text_pairs=docs, max_length=self.max_seq_length, pad_to=length
            )
            fn = self._score_fn(length)
            logits = fn(
                self.params,
                batch["input_ids"],
                batch["attention_mask"],
                batch["token_type_ids"],
            )
            if pending is not None:
                out.extend(np.asarray(pending, dtype=np.float64).tolist())
            pending = logits
        if pending is not None:
            out.extend(np.asarray(pending, dtype=np.float64).tolist())
        return out

    def predict(self, pairs: Sequence[Sequence[str]]) -> list[float]:
        """Alias for :meth:`score` (reference: conftest.py:108)."""
        return self.score(pairs)

    def predict_score(self, query: str, doc: str) -> float:
        """Single-pair variant (reference: scripts/evaluate_production.py:73)."""
        return self.score([(query, doc)])[0]

    def shard_tensor_parallel(self, mesh, axis: str = "index") -> None:
        """Split this teacher's matmuls over a mesh axis (Megatron-style TP;
        see :mod:`sskd_tpu.parallel.tp`). Subsequent ``score`` calls run
        SPMD with XLA-inserted collectives."""
        from sskd_tpu.parallel.tp import shard_params_tp

        self.params = shard_params_tp(self.params, mesh, axis)
        self._score_jit.clear()

    @staticmethod
    def get_confidence(score: float) -> float:
        """Map a raw logit to [0, 1] confidence — sigmoid; used by stage-2
        mining thresholding (reference: miners.py:148, threshold 0.6)."""
        return 1.0 / (1.0 + math.exp(-float(score)))

    def cleanup(self) -> None:
        self._score_jit.clear()

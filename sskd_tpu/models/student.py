"""StudentModel — bi-encoder wrapper with the reference's contract.

Implements the reconstructed API of the reference's missing
``src/models/student.py`` (SURVEY.md section 2.4, pinned by
tests/test_student_model.py there): ``encode / encode_queries /
encode_documents / compute_similarity / cleanup / embedding_dim / device``,
with e5-style ``"query: "``/``"passage: "`` prefixes
(reference: tests/test_student_model.py:73-102).

TPU-native differences:
- the forward pass is a jitted Flax function; ``encode_with_gradients``
  (reference: kd/train.py:180-183) has no analog because JAX training takes
  gradients of the same pure function — the trainer uses ``.apply_fn`` and
  ``.params`` directly;
- batches are padded to a small set of bucket lengths so XLA compiles a
  handful of shapes once and reuses them.

Checkpoint layout (``save()``/``load``):
    dir/
      sskd_config.json   — arch + wrapper config
      params.msgpack     — flax serialized params
      tokenizer/         — vocab.txt + tokenizer_config.json
"""

from __future__ import annotations

import functools
import json
from functools import partial
from pathlib import Path
from typing import Sequence

import numpy as np

from sskd_tpu.exceptions import ModelLoadError
from sskd_tpu.models.bert import BertConfig, BiEncoder
from sskd_tpu.tokenization import WordPieceTokenizer, get_default_tokenizer
from sskd_tpu.utils.logging import get_logger

logger = get_logger("models.student")

# Pad ladder for batch and sequence dims: every jitted program sees one of
# these static shapes, bounding compile count. On an accelerator the ladder
# starts at 16 — MXU-padding a single query to 16 rows is ~free while each
# extra bucket costs a (tunnel-priced) compile. On the CPU backend padding
# is pure linear waste — a B=1 /search paid a 16x encode AND a 16-query
# sweep (measured: fused B=1 8.2 ms -> ~3 ms with host buckets) — so the
# host ladder adds small buckets; CPU compiles are cheap.
_BUCKETS_DEVICE = (16, 32, 64, 128, 256, 512)
_BUCKETS_HOST = (1, 2, 4, 8) + _BUCKETS_DEVICE


@functools.lru_cache(maxsize=1)
def _buckets() -> tuple[int, ...]:
    import jax

    try:
        host = jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover — backend init failure
        host = False
    return _BUCKETS_HOST if host else _BUCKETS_DEVICE


def bucket_length(n: int, max_len: int) -> int:
    for b in _buckets():
        if n <= b and b <= max_len:
            return b
    return max_len


class StudentModel:
    """Bi-encoder student (e5-small-v2 class)."""

    def __init__(
        self,
        model_name: str | None = None,
        device: str | None = None,
        config: BertConfig | None = None,
        tokenizer: WordPieceTokenizer | None = None,
        params=None,
        normalize: bool = True,
        pooling: str = "mean",
        compute_dtype=None,
        max_seq_length: int = 512,
        query_prefix: str = "query: ",
        passage_prefix: str = "passage: ",
        seed: int = 0,
    ):
        import jax

        self.model_name = model_name or "intfloat/e5-small-v2"
        # Device auto-selection with CPU fallback
        # (reference: test_student_model.py:19-24).
        try:
            self.device = device or jax.devices()[0].platform
        except RuntimeError:
            self.device = "cpu"
        self.normalize = normalize
        self.pooling = pooling
        self._compute_dtype = compute_dtype
        self.max_seq_length = max_seq_length
        self.query_prefix = query_prefix
        self.passage_prefix = passage_prefix

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
            # No local weights (zero-egress host): known-architecture random
            # init. Training from scratch or conversion provides real weights.
            self.config = config or (
                BertConfig.e5_small_v2()
                if "e5" in self.model_name
                else BertConfig.tiny()
            )
            self.tokenizer = tokenizer or get_default_tokenizer()
            self.module = self._make_module()
            rng = jax.random.PRNGKey(seed)
            dummy = np.zeros((1, 8), np.int32)
            self.params = self.module.init(rng, dummy, np.ones_like(dummy))
            logger.warning(
                f"no local weights for {self.model_name!r}; random init "
                f"({self.config.num_layers}L/{self.config.hidden_size}H)"
            )
        if tokenizer is not None:
            self.tokenizer = tokenizer
        if params is not None:
            self.params = params
        self._encode_jit = {}
        self._mesh = None
        self._mesh_axis = "data"

    # ------------------------------------------------------------------
    # Loading / saving
    # ------------------------------------------------------------------

    def _make_module(self) -> BiEncoder:
        if self._compute_dtype is not None and (
            self.config.compute_dtype != self._compute_dtype
        ):
            from dataclasses import replace

            self.config = replace(self.config, compute_dtype=self._compute_dtype)
        return BiEncoder(self.config, normalize=self.normalize, pooling=self.pooling)

    def _load_own_checkpoint(self, path: Path) -> None:
        from flax import serialization
        import jax

        with open(path / "sskd_config.json") as f:
            meta = json.load(f)
        arch = meta["architecture"]
        arch.pop("compute_dtype", None)
        self.config = BertConfig(**arch)
        self.normalize = meta.get("normalize", True)
        self.pooling = meta.get("pooling", "mean")
        self.max_seq_length = meta.get("max_seq_length", 512)
        self.query_prefix = meta.get("query_prefix", self.query_prefix)
        self.passage_prefix = meta.get("passage_prefix", self.passage_prefix)
        self.tokenizer = WordPieceTokenizer.from_pretrained_dir(path / "tokenizer")
        self.module = self._make_module()
        dummy = np.zeros((1, 8), np.int32)
        template = self.module.init(jax.random.PRNGKey(0), dummy, np.ones_like(dummy))
        with open(path / "params.msgpack", "rb") as f:
            self.params = serialization.from_bytes(template, f.read())
        logger.info(f"loaded student checkpoint from {path}")

    def _load_hf_checkpoint(self, path: Path) -> None:
        from sskd_tpu.models.convert import (
            convert_bi_encoder,
            hf_config_to_bert_config,
            load_hf_checkpoint,
        )

        sd, hf_cfg = load_hf_checkpoint(path)
        self.config = hf_config_to_bert_config(hf_cfg)
        self.params = convert_bi_encoder(sd, self.config)
        self.module = self._make_module()
        vocab = path / "vocab.txt"
        if vocab.exists():
            self.tokenizer = WordPieceTokenizer.from_pretrained_dir(path)
        else:
            self.tokenizer = get_default_tokenizer()
        logger.info(f"converted HF checkpoint from {path}")

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
        meta = {
            "model_name": self.model_name,
            "architecture": arch,
            "normalize": self.normalize,
            "pooling": self.pooling,
            "max_seq_length": self.max_seq_length,
            "query_prefix": self.query_prefix,
            "passage_prefix": self.passage_prefix,
            "embedding_dim": self.embedding_dim,
        }
        with open(path / "sskd_config.json", "w") as f:
            json.dump(meta, f, indent=2)
        with open(path / "params.msgpack", "wb") as f:
            f.write(serialization.to_bytes(self.params))
        self.tokenizer.save(path / "tokenizer")
        logger.info(f"saved student checkpoint to {path}")
        return path

    # ------------------------------------------------------------------
    # Encoding
    # ------------------------------------------------------------------

    @property
    def embedding_dim(self) -> int:
        return self.config.hidden_size

    @property
    def apply_fn(self):
        return self.module.apply

    def set_mesh(self, mesh, axis: str = "data") -> None:
        """Enable data-parallel encoding: batches shard over ``axis`` of
        ``mesh`` (params replicated); corpus encoding for index builds
        scales across chips. Pass ``None`` to go back to single-device."""
        self._mesh = mesh
        self._mesh_axis = axis
        self._encode_jit.clear()

    def _encode_fn(self, length: int):
        import jax

        if length not in self._encode_jit:
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch_sharding = NamedSharding(self._mesh, P(self._mesh_axis, None))
                replicated = NamedSharding(self._mesh, P())
                fn = jax.jit(
                    lambda params, ids, mask: self.module.apply(params, ids, mask),
                    in_shardings=(replicated, batch_sharding, batch_sharding),
                    out_shardings=batch_sharding,
                )
            else:

                @partial(jax.jit)
                def fn(params, input_ids, attention_mask):
                    return self.module.apply(params, input_ids, attention_mask)

            self._encode_jit[length] = fn
        return self._encode_jit[length]

    def tokenize_batch(self, texts: Sequence[str], pad_to: int | None = None):
        """Host-side tokenization to fixed [B, L] arrays."""
        longest = 2 + max(
            (len(self.tokenizer.tokenize(t)) for t in texts), default=1
        )
        length = pad_to or bucket_length(longest, self.max_seq_length)
        return self.tokenizer.encode_batch(
            texts, max_length=self.max_seq_length, pad_to=length
        )

    def encode(
        self,
        texts: str | Sequence[str],
        normalize: bool | None = None,
        batch_size: int = 256,
        show_progress: bool = False,
        prefix: str = "",
    ) -> np.ndarray:
        """Encode to [n, embedding_dim] numpy; a bare string is wrapped into
        a one-element list (reference: test_student_model.py:39-54)."""
        if isinstance(texts, str):
            texts = [texts]
        if not texts:
            return np.zeros((0, self.embedding_dim), np.float32)
        if prefix:
            texts = [prefix + t for t in texts]
        out = []
        # double-buffer: dispatch chunk i, then tokenize + dispatch chunk
        # i+1 BEFORE pulling chunk i to host — JAX's async dispatch keeps
        # the device busy through chunk i while the host tokenizes i+1, so
        # a corpus build overlaps tokenization with encode instead of
        # alternating them.
        pending: tuple | None = None  # (device embeddings, live rows)
        for start in range(0, len(texts), batch_size):
            chunk = list(texts[start : start + batch_size])
            n = len(chunk)
            # bucket the BATCH dimension too: serving micro-batches arrive
            # at arbitrary sizes and every new size would recompile
            padded_n = bucket_length(n, batch_size)
            if self._mesh is not None:
                dp = self._mesh.shape[self._mesh_axis]
                padded_n = -(-padded_n // dp) * dp  # divisible across shards
            if padded_n > n:
                chunk = chunk + [""] * (padded_n - n)
            batch = self.tokenize_batch(chunk)
            fn = self._encode_fn(batch["input_ids"].shape[1])
            emb = fn(self.params, batch["input_ids"], batch["attention_mask"])
            if pending is not None:
                out.append(np.asarray(pending[0])[: pending[1]])
            pending = (emb, n)
        if pending is not None:
            out.append(np.asarray(pending[0])[: pending[1]])
        emb = np.concatenate(out, axis=0)
        if normalize is not None and normalize != self.normalize:
            if normalize:
                emb = emb / np.maximum(
                    np.linalg.norm(emb, axis=1, keepdims=True), 1e-12
                )
        return emb

    def encode_queries(
        self, texts: str | Sequence[str], show_progress: bool = False, batch_size: int = 256
    ) -> np.ndarray:
        """Prepends the e5 query prefix (reference: test_student_model.py:73-87)."""
        return self.encode(texts, batch_size=batch_size, prefix=self.query_prefix)

    def encode_documents(
        self, texts: str | Sequence[str], batch_size: int = 256, show_progress: bool = False
    ) -> np.ndarray:
        """Prepends the e5 passage prefix (reference: test_student_model.py:89-102)."""
        return self.encode(texts, batch_size=batch_size, prefix=self.passage_prefix)

    def compute_similarity(self, query_embs, doc_embs) -> np.ndarray:
        """[nq, nd] dot/cosine matrix (reference: test_student_model.py:104-124)."""
        return np.asarray(query_embs) @ np.asarray(doc_embs).T

    def cleanup(self) -> None:
        """Release cached compiled functions and device buffers
        (reference: test_student_model.py:126-137 — GPU memory release)."""
        self._encode_jit.clear()

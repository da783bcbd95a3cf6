"""Flax BERT-family encoder — the single transformer backbone for both the
bi-encoder student (e5-small-v2 class) and the cross-encoder teacher
(bge-reranker-large = XLM-RoBERTa-large class).

The reference ran these models through sentence-transformers on PyTorch/ATen
(reference: SURVEY.md section 2.9, missing src/models/* contract in section
2.4). Here the forward pass is a pure Flax function: jit-compiled once per
static shape, bf16 compute on the MXU with f32 params, mask-additive
attention, erf-exact GELU for HF parity.

Architecture knobs cover both families:
- BERT style (e5): position ids start at 0, token_type vocab 2.
- RoBERTa style (bge-reranker): position ids start at ``pad_token_id + 1``
  and skip padding positions, token_type vocab 1.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_token_id: int = 0
    position_style: str = "bert"  # "bert" | "roberta"
    compute_dtype: jnp.dtype = field(default=jnp.float32)

    @classmethod
    def e5_small_v2(cls, **kw) -> "BertConfig":
        """intfloat/e5-small-v2: 12-layer, 384-hidden BERT encoder
        (reference student, src/config.py:22-32)."""
        return cls(
            vocab_size=30522,
            hidden_size=384,
            num_layers=12,
            num_heads=12,
            intermediate_size=1536,
            max_position_embeddings=512,
            type_vocab_size=2,
            position_style="bert",
            **kw,
        )

    @classmethod
    def bge_reranker_large(cls, **kw) -> "BertConfig":
        """BAAI/bge-reranker-large: XLM-RoBERTa-large cross-encoder
        (reference teacher, src/config.py:35-45)."""
        return cls(
            vocab_size=250002,
            hidden_size=1024,
            num_layers=24,
            num_heads=16,
            intermediate_size=4096,
            max_position_embeddings=514,
            type_vocab_size=1,
            layer_norm_eps=1e-5,
            pad_token_id=1,
            position_style="roberta",
            **kw,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 2048, **kw) -> "BertConfig":
        """Small config for tests/demo (fast to init and compile)."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            intermediate_size=128,
            max_position_embeddings=512,
            **kw,
        )

    @classmethod
    def demo_teacher(cls, vocab_size: int = 2048, **kw) -> "BertConfig":
        """Demo-scale TEACHER: ~4x the tiny student's capacity, mirroring
        the reference's teacher >> student asymmetry (bge-reranker-large
        560M vs e5-small 33M) at demo scale — the tiny 2L/64H cross-encoder
        memorizes the demo relevance task instead of learning its
        query-word -> doc-word mapping, leaving nothing distillable."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=128,
            num_layers=4,
            num_heads=4,
            intermediate_size=512,
            max_position_embeddings=512,
            **kw,
        )


class SelfAttention(nn.Module):
    """Multi-head self-attention with additive mask.

    Plain XLA path: at 512 tokens the fused-softmax attention fits VMEM and
    XLA fuses QK^T -> softmax -> V well; a Pallas flash-attention kernel is
    dispatched by :mod:`sskd_tpu.ops.attention` for long-batch encode paths.
    """

    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic: bool):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=cfg.compute_dtype, name=name)
        B, L, H = hidden.shape

        def split_heads(x):
            return x.reshape(B, L, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split_heads(dense("query")(hidden))
        k = split_heads(dense("key")(hidden))
        v = split_heads(dense("value")(hidden))

        from sskd_tpu.ops.attention import scaled_dot_attention

        if not deterministic and cfg.attention_dropout > 0.0:
            # Training path: dropout must hit the attention PROBABILITIES
            # (HF BERT semantics; the reference trained with dropout active,
            # reference: src/kd/train.py:127).
            import os as _os

            if jax.default_backend() == "tpu" and _os.environ.get(
                "SSKD_FUSED_DROPOUT_ATTN", "1"
            ) == "1":
                # Fused Pallas kernel: probs + dropout mask never leave
                # VMEM, mask regenerated in the backward from the same seed
                # (ops/attention.py) — 429.3 -> ~255 ms/step at KD bench
                # shapes vs the materialized path below.
                from sskd_tpu.ops.attention import dropout_attention

                seed = jax.random.randint(
                    self.make_rng("dropout"),
                    (),
                    0,
                    jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
                ctx = dropout_attention(
                    q,
                    k,
                    v,
                    attn_bias[:, 0, 0, :],
                    cfg.attention_dropout,
                    seed,
                ).astype(v.dtype)
            else:
                # Materialized-probs XLA fallback (CPU tests / escape hatch
                # SSKD_FUSED_DROPOUT_ATTN=0).
                d_head = q.shape[-1]
                scores = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
                ) / jnp.sqrt(jnp.asarray(d_head, jnp.float32))
                scores = scores + attn_bias.astype(scores.dtype)
                probs = jax.nn.softmax(scores, axis=-1)
                probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=False)
                ctx = jnp.einsum(
                    "bhqk,bhkd->bhqd",
                    probs.astype(v.dtype),
                    v,
                    preferred_element_type=jnp.float32,
                ).astype(v.dtype)
        else:
            ctx = scaled_dot_attention(q, k, v, attn_bias)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, H)
        out = nn.Dense(cfg.hidden_size, dtype=cfg.compute_dtype, name="output")(ctx)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        return out


class TransformerLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, attn_bias, deterministic: bool):
        cfg = self.config
        attn_out = SelfAttention(cfg, name="attention")(hidden, attn_bias, deterministic)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.compute_dtype, name="attention_norm"
        )(hidden + attn_out)

        ff = nn.Dense(cfg.intermediate_size, dtype=cfg.compute_dtype, name="intermediate")(
            hidden
        )
        ff = jax.nn.gelu(ff, approximate=False)  # erf GELU, HF parity
        ff = nn.Dense(cfg.hidden_size, dtype=cfg.compute_dtype, name="ffn_output")(ff)
        ff = nn.Dropout(cfg.hidden_dropout)(ff, deterministic=deterministic)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.compute_dtype, name="ffn_norm"
        )(hidden + ff)
        return hidden


class BertEncoder(nn.Module):
    """Token ids -> contextual hidden states ``[B, L, H]``."""

    config: BertConfig

    def position_ids(self, input_ids, attention_mask):
        cfg = self.config
        L = input_ids.shape[1]
        if cfg.position_style == "roberta":
            # RoBERTa: cumulative positions over non-pad tokens, offset by
            # pad_token_id + 1; pad positions get pad_token_id.
            mask = attention_mask.astype(jnp.int32)
            incremental = jnp.cumsum(mask, axis=1) * mask
            return incremental + cfg.pad_token_id
        return jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], input_ids.shape)

    @nn.compact
    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        deterministic: bool = True,
    ):
        cfg = self.config
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        word_emb = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.compute_dtype, name="word_embeddings"
        )(input_ids)
        pos_emb = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            dtype=cfg.compute_dtype,
            name="position_embeddings",
        )(self.position_ids(input_ids, attention_mask))
        type_emb = nn.Embed(
            cfg.type_vocab_size,
            cfg.hidden_size,
            dtype=cfg.compute_dtype,
            name="token_type_embeddings",
        )(jnp.clip(token_type_ids, 0, cfg.type_vocab_size - 1))

        hidden = word_emb + pos_emb + type_emb
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.compute_dtype, name="embeddings_norm"
        )(hidden)
        hidden = nn.Dropout(cfg.hidden_dropout)(hidden, deterministic=deterministic)

        # Additive attention bias: 0 where attended, large-negative where pad.
        attn_bias = (1.0 - attention_mask[:, None, None, :].astype(cfg.compute_dtype)) * (
            jnp.finfo(cfg.compute_dtype).min / 2
        )

        for i in range(cfg.num_layers):
            hidden = TransformerLayer(cfg, name=f"layer_{i}")(
                hidden, attn_bias, deterministic
            )
        return hidden


def mean_pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean pooling over the sequence axis (sentence-transformers
    semantics, reference: configs/kd.yaml:18-19 pooling: mean)."""
    mask = attention_mask[:, :, None].astype(hidden.dtype)
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    return summed / counts


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class BiEncoder(nn.Module):
    """Student tower: encoder -> pooling (masked mean or CLS) -> optional
    L2 norm. Output ``[B, H]`` embeddings (reference contract SURVEY.md
    section 2.4; pooling knob reference: src/config.py:22-32)."""

    config: BertConfig
    normalize: bool = True
    pooling: str = "mean"  # "mean" | "cls"

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None, deterministic=True):
        hidden = BertEncoder(self.config, name="encoder")(
            input_ids, attention_mask, token_type_ids, deterministic
        )
        if self.pooling == "cls":
            emb = hidden[:, 0, :]
        else:
            emb = mean_pool(hidden, attention_mask)
        emb = emb.astype(jnp.float32)
        if self.normalize:
            emb = l2_normalize(emb)
        return emb


class CrossEncoder(nn.Module):
    """Teacher tower: encoder -> CLS -> dense(1) scalar relevance logit,
    raw range roughly [-10, 10] (reference: docs/decisions/adr-004:9)."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids=None, deterministic=True):
        hidden = BertEncoder(self.config, name="encoder")(
            input_ids, attention_mask, token_type_ids, deterministic
        )
        cls = hidden[:, 0, :]
        # XLM-R classification head: dense+tanh then projection.
        pooled = nn.Dense(self.config.hidden_size, dtype=self.config.compute_dtype, name="pooler")(cls)
        pooled = jnp.tanh(pooled)
        logit = nn.Dense(1, dtype=jnp.float32, name="classifier")(pooled.astype(jnp.float32))
        return logit[:, 0]

"""HuggingFace torch checkpoint -> Flax parameter conversion.

The reference loaded its models through sentence-transformers
(reference: SURVEY.md section 2.4 — StudentModel wraps SentenceTransformer,
TeacherModel wraps CrossEncoder). Here the weights are converted once into
the framework's own Flax pytree and all forward passes run in XLA.

Supported source layouts:
- BERT encoders (e5-small-v2 family): ``bert.`` / bare ``encoder.layer`` keys.
- XLM-RoBERTa sequence classifiers (bge-reranker-large family):
  ``roberta.`` keys + ``classifier.dense`` / ``classifier.out_proj`` head.

Conversion is validated offline by parity tests against randomly initialized
HF torch models (zero-egress environment: real weights convert identically
when mounted — the mapping is name-based, not value-based).
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping

import numpy as np

from sskd_tpu.exceptions import WeightConversionError
from sskd_tpu.models.bert import BertConfig


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (no torch import needed at call sites)."""
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _strip_prefix(sd: Mapping[str, "object"]) -> dict[str, np.ndarray]:
    """Normalize key prefixes: drop leading 'bert.', 'roberta.', 'model.'."""
    out = {}
    for key, value in sd.items():
        for prefix in ("bert.", "roberta.", "model."):
            if key.startswith(prefix):
                key = key[len(prefix) :]
                break
        out[key] = _t(value)
    return out


def hf_config_to_bert_config(hf_cfg: dict, compute_dtype=None) -> BertConfig:
    """Map an HF config.json dict onto :class:`BertConfig`."""
    import jax.numpy as jnp

    model_type = hf_cfg.get("model_type", "bert")
    position_style = "roberta" if "roberta" in model_type else "bert"
    kw = {}
    if compute_dtype is not None:
        kw["compute_dtype"] = compute_dtype
    else:
        kw["compute_dtype"] = jnp.float32
    return BertConfig(
        vocab_size=hf_cfg["vocab_size"],
        hidden_size=hf_cfg["hidden_size"],
        num_layers=hf_cfg["num_hidden_layers"],
        num_heads=hf_cfg["num_attention_heads"],
        intermediate_size=hf_cfg["intermediate_size"],
        max_position_embeddings=hf_cfg["max_position_embeddings"],
        type_vocab_size=hf_cfg.get("type_vocab_size", 2),
        layer_norm_eps=hf_cfg.get("layer_norm_eps", 1e-12),
        pad_token_id=hf_cfg.get("pad_token_id", 0),
        position_style=position_style,
        **kw,
    )


def convert_encoder_params(
    state_dict: Mapping[str, "object"], config: BertConfig
) -> dict:
    """torch encoder state_dict -> Flax param subtree for
    :class:`sskd_tpu.models.bert.BertEncoder` (module name ``encoder``)."""
    sd = _strip_prefix(state_dict)

    def req(key: str) -> np.ndarray:
        if key not in sd:
            raise WeightConversionError(f"missing weight {key!r}")
        return sd[key]

    def dense(prefix: str) -> dict:
        return {
            "kernel": req(f"{prefix}.weight").T,  # torch [out,in] -> flax [in,out]
            "bias": req(f"{prefix}.bias"),
        }

    def norm(prefix: str) -> dict:
        return {"scale": req(f"{prefix}.weight"), "bias": req(f"{prefix}.bias")}

    params = {
        "word_embeddings": {"embedding": req("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": req("embeddings.position_embeddings.weight")
        },
        "token_type_embeddings": {
            "embedding": (
                req("embeddings.token_type_embeddings.weight")
                if "embeddings.token_type_embeddings.weight" in sd
                else np.zeros(
                    (config.type_vocab_size, config.hidden_size), np.float32
                )
            )
        },
        "embeddings_norm": norm("embeddings.LayerNorm"),
    }
    for i in range(config.num_layers):
        base = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{base}.attention.self.query"),
                "key": dense(f"{base}.attention.self.key"),
                "value": dense(f"{base}.attention.self.value"),
                "output": dense(f"{base}.attention.output.dense"),
            },
            "attention_norm": norm(f"{base}.attention.output.LayerNorm"),
            "intermediate": dense(f"{base}.intermediate.dense"),
            "ffn_output": dense(f"{base}.output.dense"),
            "ffn_norm": norm(f"{base}.output.LayerNorm"),
        }
    return params


def convert_bi_encoder(state_dict, config: BertConfig) -> dict:
    """Full param tree for :class:`BiEncoder` (student)."""
    return {"params": {"encoder": convert_encoder_params(state_dict, config)}}


def convert_cross_encoder(state_dict, config: BertConfig) -> dict:
    """Full param tree for :class:`CrossEncoder` (teacher).

    Head mapping: XLM-R classifier.dense -> pooler, classifier.out_proj ->
    classifier; BERT-style pooler.dense + classifier also accepted.
    """
    sd = _strip_prefix(state_dict)
    encoder = convert_encoder_params(state_dict, config)

    def dense_from(*names):
        for name in names:
            if f"{name}.weight" in sd:
                return {
                    "kernel": sd[f"{name}.weight"].T,
                    "bias": sd[f"{name}.bias"],
                }
        raise WeightConversionError(f"no head weight among {names}")

    pooler = dense_from("classifier.dense", "pooler.dense")
    classifier = dense_from("classifier.out_proj", "classifier")
    return {
        "params": {
            "encoder": encoder,
            "pooler": pooler,
            "classifier": classifier,
        }
    }


def load_hf_checkpoint(model_dir: str | Path) -> tuple[dict, dict]:
    """Read an HF checkpoint dir -> (state_dict, hf_config_dict).
    Supports model.safetensors and pytorch_model.bin."""
    import json

    model_dir = Path(model_dir)
    with open(model_dir / "config.json") as f:
        hf_cfg = json.load(f)
    st_path = model_dir / "model.safetensors"
    pt_path = model_dir / "pytorch_model.bin"
    if st_path.exists():
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    elif pt_path.exists():
        import torch

        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    else:
        raise WeightConversionError(f"no weights file in {model_dir}")
    return sd, hf_cfg

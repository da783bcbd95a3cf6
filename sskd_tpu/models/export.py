"""Quantized model export — the TPU-native analog of the reference's ONNX
INT8 export path (reference: missing src/models/export_onnx.py, pinned by
scripts/export_to_onnx.py:9,40-45: INT8 dynamic quantization + parity
validation vs the full-precision model, kept as a deployment escape hatch
per adr-007:27-28).

Export product: the framework checkpoint plus an int8 weight file (per-row
symmetric quantization of every 2-D matrix, f32 scales), with a validation
step that round-trips the quantized weights through the encoder and checks
embedding cosine parity.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from sskd_tpu.exceptions import ModelError
from sskd_tpu.utils.logging import get_logger

logger = get_logger("models.export")

_VALIDATION_SENTENCES = [
    "what is machine learning",
    "the capital of france is paris",
    "how do neural networks learn",
    "python is a programming language",
]


def quantize_param_tree(params) -> tuple[dict, dict]:
    """Flatten the param pytree; quantize 2-D float matrices to int8 +
    per-row scales, keep everything else f32. Returns (quantized_flat,
    meta)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    quantized: dict[str, dict] = {}
    total_f32 = 0
    total_int8 = 0
    for path, leaf in flat:
        key = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        arr = np.asarray(leaf)
        total_f32 += arr.nbytes
        if arr.ndim == 2 and arr.dtype in (np.float32, np.float64) and arr.shape[0] >= 8:
            absmax = np.maximum(np.abs(arr).max(axis=1), 1e-9)
            scales = (absmax / 127.0).astype(np.float32)
            values = np.clip(np.round(arr / scales[:, None]), -127, 127).astype(np.int8)
            quantized[key] = {"int8": values, "scales": scales}
            total_int8 += values.nbytes + scales.nbytes
        else:
            quantized[key] = {"f32": arr.astype(np.float32)}
            total_int8 += arr.nbytes
    meta = {"bytes_f32": int(total_f32), "bytes_quantized": int(total_int8)}
    return quantized, meta


def dequantize_param_tree(template, quantized: dict):
    """Rebuild a param pytree shaped like ``template`` from the quantized
    flat dict."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        entry = quantized[key]
        if "int8" in entry:
            leaves.append(
                entry["int8"].astype(np.float32) * entry["scales"][:, None]
            )
        else:
            leaves.append(entry["f32"])
    return jax.tree_util.tree_unflatten(treedef, [leaf for _, leaf in zip(flat, leaves)])


def export_student_model(
    student,
    output_dir: str | Path,
    quantize: bool = True,
    validate: bool = True,
    min_cosine: float = 0.99,
) -> dict:
    """Export checkpoint (+ int8 weights) with parity validation
    (reference contract: scripts/export_to_onnx.py:40-45)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    ckpt_dir = output_dir / "checkpoint"
    student.save(ckpt_dir)
    report: dict = {"checkpoint": str(ckpt_dir)}

    if quantize:
        quantized, meta = quantize_param_tree(student.params)
        qpath = output_dir / "weights_int8.npz"
        arrays = {}
        for key, entry in quantized.items():
            for kind, arr in entry.items():
                arrays[f"{key}::{kind}"] = arr
        np.savez_compressed(qpath, **arrays)
        report["quantized"] = str(qpath)
        report.update(meta)
        report["compression_ratio"] = round(
            meta["bytes_f32"] / max(1, meta["bytes_quantized"]), 2
        )

        if validate:
            ref_emb = student.encode(_VALIDATION_SENTENCES)
            original = student.params
            try:
                student.params = dequantize_param_tree(original, quantized)
                student.cleanup()
                q_emb = student.encode(_VALIDATION_SENTENCES)
            finally:
                student.params = original
                student.cleanup()
            cos = np.sum(ref_emb * q_emb, axis=1) / (
                np.linalg.norm(ref_emb, axis=1) * np.linalg.norm(q_emb, axis=1) + 1e-12
            )
            report["validation_min_cosine"] = float(cos.min())
            report["validation_passed"] = bool(cos.min() >= min_cosine)
            if not report["validation_passed"]:
                raise ModelError(
                    "int8 export failed parity validation",
                    details={"min_cosine": float(cos.min()), "required": min_cosine},
                )
    with open(output_dir / "export_report.json", "w") as f:
        json.dump(report, f, indent=2)
    logger.info(f"exported model to {output_dir}: {report}")
    return report


def load_quantized_weights(npz_path: str | Path) -> dict:
    """Read back a weights_int8.npz into the flat quantized dict."""
    data = np.load(npz_path)
    out: dict[str, dict] = {}
    for full_key in data.files:
        key, _, kind = full_key.rpartition("::")
        out.setdefault(key, {})[kind] = data[full_key]
    return out

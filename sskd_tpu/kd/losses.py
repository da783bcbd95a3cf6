"""KD losses as pure jit-compatible functions.

Exact math of the reference's torch modules (reference: src/kd/losses.py):

- Margin-MSE (losses.py:16-60): ``MSE(s - max(s), t/T - max(t/T))`` — student
  margins against temperature-softened teacher margins, both relative to the
  per-query max.
- Listwise KL (losses.py:63-106): ``KL(log_softmax(s/T) || softmax(t/T)) * T^2``,
  batch-mean.
- InfoNCE (losses.py:109-149): fixed tau, positive at column 0:
  ``-log_softmax(s/tau)[:, 0]`` mean.
- Combined (losses.py:152-252): weighted 0.6/0.2/0.2; temperature applies to
  Margin-MSE + Listwise only; linear annealing 4.0 -> 2.0. The reference
  annealed per *epoch* starting at 3.33 (train.py:161 quirk, SURVEY.md 7.4);
  here annealing is per-step via ``temperature_at(progress)`` with progress
  in [0, 1], hitting the documented 4.0 -> 2.0 schedule exactly.

All functions take a validity ``mask`` [B, N] (1 = real doc, 0 = padding)
because TPU batches are padded to static shapes (SURVEY.md section 7.3 —
ragged negatives -> fixed N with -inf masking); invariants vs unpadded values
are pinned in tests/test_losses.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9


def _masked_max(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.where(mask > 0, x, _NEG), axis=-1, keepdims=True)


def margin_mse_loss(
    student_scores: jnp.ndarray,
    teacher_scores: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    temperature: float | jnp.ndarray = 1.0,
) -> jnp.ndarray:
    """MSE between max-relative margins (reference: src/kd/losses.py:16-60)."""
    if mask is None:
        mask = jnp.ones_like(student_scores)
    mask = mask.astype(student_scores.dtype)
    t_soft = teacher_scores / temperature
    s_margin = student_scores - _masked_max(student_scores, mask)
    t_margin = t_soft - _masked_max(t_soft, mask)
    sq = (s_margin - t_margin) ** 2 * mask
    return jnp.sum(sq) / jnp.maximum(jnp.sum(mask), 1.0)


def listwise_kd_loss(
    student_scores: jnp.ndarray,
    teacher_scores: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    temperature: float | jnp.ndarray = 1.0,
) -> jnp.ndarray:
    """KL(student || teacher) over the doc list, scaled by T^2, batch-mean
    (reference: src/kd/losses.py:63-106)."""
    if mask is None:
        mask = jnp.ones_like(student_scores)
    neg = jnp.where(mask > 0, 0.0, _NEG)
    s_logp = jax.nn.log_softmax(student_scores / temperature + neg, axis=-1)
    t_logp = jax.nn.log_softmax(teacher_scores / temperature + neg, axis=-1)
    t_p = jnp.exp(t_logp)
    kl = jnp.sum(jnp.where(mask > 0, t_p * (t_logp - s_logp), 0.0), axis=-1)
    # rows with no valid docs (batch-tail padding) must not dilute the mean
    row_valid = jnp.max(mask, axis=-1)
    return (
        jnp.sum(kl * row_valid) / jnp.maximum(jnp.sum(row_valid), 1.0)
    ) * temperature**2


def contrastive_loss(
    student_scores: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    tau: float = 0.05,
) -> jnp.ndarray:
    """InfoNCE with the positive at column 0
    (reference: src/kd/losses.py:109-149, fixed tau=0.05)."""
    if mask is None:
        mask = jnp.ones_like(student_scores)
    neg = jnp.where(mask > 0, 0.0, _NEG)
    logp = jax.nn.log_softmax(student_scores / tau + neg, axis=-1)
    # rows with no valid docs (batch-tail padding) contribute nothing
    row_valid = jnp.max(mask, axis=-1)
    return -jnp.sum(logp[:, 0] * row_valid) / jnp.maximum(jnp.sum(row_valid), 1.0)


def temperature_at(
    progress: float | jnp.ndarray, t_start: float = 4.0, t_end: float = 2.0
) -> jnp.ndarray:
    """Linear temperature annealing by training progress in [0, 1]
    (reference: src/kd/losses.py:219-231 update_temperature, per-step here)."""
    progress = jnp.clip(progress, 0.0, 1.0)
    return t_start + (t_end - t_start) * progress


def combined_kd_loss(
    student_scores: jnp.ndarray,
    teacher_scores: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    temperature: float | jnp.ndarray = 4.0,
    margin_mse_weight: float = 0.6,
    listwise_kd_weight: float = 0.2,
    contrastive_weight: float = 0.2,
    tau: float = 0.05,
    contrastive_scores: jnp.ndarray | None = None,
    contrastive_mask: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """Weighted 3-loss combination; temperature touches Margin-MSE and
    Listwise but NOT the contrastive term (reference: src/kd/losses.py:233-252).
    Returns the reference's dict keys
    {loss, margin_mse, listwise_kd, contrastive, temperature}.

    ``contrastive_scores``/``contrastive_mask``: optional WIDER score matrix
    for the InfoNCE term only (positive still at column 0) — the trainer
    passes the in-batch-negatives expansion here
    (config ``loss.in_batch_negatives``); the distillation terms always see
    the per-query candidate scores, since teacher scores exist only for a
    query's own candidates."""
    mm = margin_mse_loss(student_scores, teacher_scores, mask, temperature)
    lw = listwise_kd_loss(student_scores, teacher_scores, mask, temperature)
    ct_s = student_scores if contrastive_scores is None else contrastive_scores
    ct_m = mask if contrastive_scores is None else contrastive_mask
    ct = contrastive_loss(ct_s, ct_m, tau)
    total = margin_mse_weight * mm + listwise_kd_weight * lw + contrastive_weight * ct
    return {
        "loss": total,
        "margin_mse": mm,
        "listwise_kd": lw,
        "contrastive": ct,
        "temperature": jnp.asarray(temperature, jnp.float32),
    }

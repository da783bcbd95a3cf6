from sskd_tpu.kd.losses import (
    combined_kd_loss,
    contrastive_loss,
    listwise_kd_loss,
    margin_mse_loss,
    temperature_at,
)

__all__ = [
    "margin_mse_loss",
    "listwise_kd_loss",
    "contrastive_loss",
    "combined_kd_loss",
    "temperature_at",
]

from sskd_tpu.ops.attention import scaled_dot_attention
from sskd_tpu.ops.topk import cosine_topk

__all__ = ["scaled_dot_attention", "cosine_topk"]

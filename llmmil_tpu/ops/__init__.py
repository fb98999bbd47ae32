from .positional import sinusoidal_pe
from .masked import masked_softmax, masked_mean, segment_mean_landmarks
from .mil import gated_attention_logits, gated_attention_pool
from .nystrom import (moore_penrose_pinv, nystrom_attention,
                      nystrom_attn_rows, nystrom_attn_full)
from .activations import quick_gelu

__all__ = [
    "sinusoidal_pe", "masked_softmax", "masked_mean",
    "segment_mean_landmarks", "gated_attention_logits",
    "gated_attention_pool", "moore_penrose_pinv", "nystrom_attention",
    "nystrom_attn_rows", "nystrom_attn_full",
    "quick_gelu",
]

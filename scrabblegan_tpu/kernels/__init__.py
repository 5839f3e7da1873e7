from scrabblegan_tpu.kernels.attention import (
    fused_nonlocal_block,
    nonlocal_attention,
    nonlocal_attention_packed,
)

__all__ = ["fused_nonlocal_block", "nonlocal_attention",
           "nonlocal_attention_packed"]

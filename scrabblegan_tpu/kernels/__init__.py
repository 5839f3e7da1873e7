from scrabblegan_tpu.kernels.attention import nonlocal_attention

__all__ = ["nonlocal_attention"]

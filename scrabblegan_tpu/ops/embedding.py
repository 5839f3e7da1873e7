"""ScrabbleGAN per-character filter bank (the paper's "spatial embedding").

Capability parity with SpatialEmbedding (arch_ops.py:77-95): a learnable tensor
[vocab, k, d] (default [52, 32, 8192], ~13.6M params — the largest single weight);
a character-id lookup returns per-character patches that the generator contracts
with the z0 latent chunk to form per-character 4x4x512 spatial seeds.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


class FilterBank(nn.Module):
    vocab_size: int
    filter_dim: Tuple[int, int] = (32, 8192)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids):
        bank = self.param(
            "filter_bank",
            nn.initializers.glorot_uniform(),
            (self.vocab_size, self.filter_dim[0], self.filter_dim[1]),
        )
        # ids: (B, L) int32 -> (B, L, k, d)
        return jnp.take(bank, ids, axis=0).astype(self.dtype)

"""SAGAN non-local (self-attention) block.

Capability parity with the reference's NonLocalBlock (arch_ops.py:5-72): 1x1 convs
theta (C/8), phi (C/8, maxpool 2x2), g (C/2, maxpool 2x2); attn = softmax(theta phi^T);
output = input + sigma * conv1x1(attn g) with a learned scalar `sigma` initialized to 0.

This is the only O((HW)^2) op in the framework (SURVEY.md §5 "sequence-scaling
analog": image width is the sequence axis, max 160px). The default path is pure-XLA
(fuses well at these sizes); a fused Pallas kernel is available via
`scrabblegan_tpu.kernels.attention` and toggled by `use_pallas`.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from scrabblegan_tpu.ops.layers import SNConv


class NonLocalBlock(nn.Module):
    use_sn: bool = True
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        c_attn = c // 8
        c_g = c // 2

        theta = SNConv(c_attn, (1, 1), use_bias=False, use_sn=self.use_sn, dtype=self.dtype, name="theta")(
            x, train
        )
        phi = SNConv(c_attn, (1, 1), use_bias=False, use_sn=self.use_sn, dtype=self.dtype, name="phi")(
            x, train
        )
        g = SNConv(c_g, (1, 1), use_bias=False, use_sn=self.use_sn, dtype=self.dtype, name="g")(x, train)

        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        g = nn.max_pool(g, (2, 2), strides=(2, 2))

        theta_flat = theta.reshape(b, h * w, c_attn)
        phi_flat = phi.reshape(b, (h // 2) * (w // 2), c_attn)
        g_flat = g.reshape(b, (h // 2) * (w // 2), c_g)

        if self.use_pallas:
            from scrabblegan_tpu.kernels.attention import nonlocal_attention

            attn_g = nonlocal_attention(theta_flat, phi_flat, g_flat)
        else:
            attn = jnp.einsum(
                "bqc,bkc->bqk", theta_flat, phi_flat, preferred_element_type=jnp.float32
            )
            attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            attn_g = jnp.einsum("bqk,bkc->bqc", attn, g_flat, preferred_element_type=jnp.float32)
            attn_g = attn_g.astype(self.dtype)

        attn_g = attn_g.reshape(b, h, w, c_g)
        attn_g = SNConv(c, (1, 1), use_bias=False, use_sn=self.use_sn, dtype=self.dtype, name="out")(
            attn_g, train
        )

        sigma = self.param("sigma", nn.initializers.zeros, ())
        return sigma.astype(self.dtype) * attn_g + x

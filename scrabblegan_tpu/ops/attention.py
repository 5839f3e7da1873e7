"""SAGAN non-local (self-attention) block.

Capability parity with the reference's NonLocalBlock (arch_ops.py:5-72): 1x1 convs
theta (C/8), phi (C/8, maxpool 2x2), g (C/2, maxpool 2x2); attn = softmax(theta phi^T);
output = input + sigma * conv1x1(attn g) with a learned scalar `sigma` initialized to 0.

This is the only O((HW)^2) op in the framework (SURVEY.md §5 "sequence-scaling
analog": image width is the sequence axis, max 160px). With use_pallas=False the
block is pure XLA in the reference's NHWC shapes. With use_pallas=True, `dataflow`
selects how the ops AROUND the Pallas softmax core are laid out — all four
compute the same function on one shared param tree (tested):

- 'nhwc1' (default): like 'nhwc' but the three 1x1 projections run as ONE
  matmul with natural bhwd output (x read once, one lane-padded activation
  written instead of three). Fastest measured on v5e: 49.3k img/s len-5 /
  20.5k len-10 inference, train neutral (microbench, bf16 b1024 / f32 b16).
- 'nhwc': 1x1 convs + pooling stay NHWC in XLA; only the flattened
  attention operands are transposed into the kernel's channel-packed (B, C, N)
  layout at the boundary. 48.0k img/s len-5 inference, 28.9 train steps/s
  len-5.
- 'packed': the 1x1 projections become matmuls on identity-extracted SN kernels
  feeding the kernel directly in (B, C, N); pooling runs on packed activations;
  no boundary transposes. Motivated by the profiler showing the NHWC projection
  activations lane-padded 16x/4x in HBM — but MEASURED SLOWER on v5e (38.7k
  img/s len-5, 26.6 steps/s): the "bdhw" projection einsum's transposed output
  costs more than the lane-padding it avoids, and XLA fuses the NHWC 1x1 convs
  into their neighbors better than the hand layout.
- 'fused': 'packed' plus the whole block (theta projection, softmax core, out
  projection, residual) as ONE Pallas kernel (kernels/attention.py:
  fused_nonlocal_block). Also measured slower (30.8k img/s len-5): the kernel
  serializes projections the XLA scheduler would overlap, and its x tiles
  (QB, 64) re-pad the lane dim the packed matmuls avoided.

The non-default dataflows are kept as tested, selectable alternatives
(env SCRABBLEGAN_ATTN_DATAFLOW or the `dataflow` attribute) — the balance may
flip on other TPU generations or compiler versions.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from scrabblegan_tpu.ops.layers import SNConv


def _extract_kernel(conv: SNConv, c_in: int, dtype, train: bool):
    """Spectrally-normalized 1x1 kernel as a (c_in, c_out) matrix.

    Applying the conv to a (1, 1, c_in, c_in) identity image yields exactly
    W/sigma(W) row by row — the SN power iteration depends only on the kernel,
    so the stats update is identical to a call on real data, and the param /
    batch_stats trees (hence checkpoints) are shared with the NHWC path."""
    eye = jnp.eye(c_in, dtype=dtype)[None, None]  # (1, 1, c_in, c_in)
    return conv(eye, train)[0, 0]  # (c_in, c_out)


def _max_pool_2x2_packed(xT4):
    """2x2/2 max pool on channel-packed (B, C, H, W) activations.

    Strided slices + elementwise max rather than lax.reduce_window: identical
    result for even H/W (always true here — H in {8..32}, W = 16L or 80), and
    reduce_window(max) fails reverse-mode linearization inside the composite
    train step's grad."""
    a = jnp.maximum(xT4[..., 0::2, 0::2], xT4[..., 0::2, 1::2])
    b = jnp.maximum(xT4[..., 1::2, 0::2], xT4[..., 1::2, 1::2])
    return jnp.maximum(a, b)


class NonLocalBlock(nn.Module):
    use_sn: bool = True
    use_pallas: bool = False
    # '' resolves to env SCRABBLEGAN_ATTN_DATAFLOW or 'nhwc1' (the measured-
    # fastest layout on v5e — see module docstring for the A/B numbers).
    dataflow: str = ""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        c_attn = c // 8
        c_g = c // 2
        dataflow = (self.dataflow
                    or os.environ.get("SCRABBLEGAN_ATTN_DATAFLOW", "nhwc1"))
        if dataflow not in ("nhwc", "nhwc1", "packed", "fused"):
            raise ValueError(f"Unknown attention dataflow: {dataflow!r}")

        theta_conv = SNConv(c_attn, (1, 1), use_bias=False, use_sn=self.use_sn,
                            dtype=self.dtype, name="theta")
        phi_conv = SNConv(c_attn, (1, 1), use_bias=False, use_sn=self.use_sn,
                          dtype=self.dtype, name="phi")
        g_conv = SNConv(c_g, (1, 1), use_bias=False, use_sn=self.use_sn,
                        dtype=self.dtype, name="g")
        out_conv = SNConv(c, (1, 1), use_bias=False, use_sn=self.use_sn,
                          dtype=self.dtype, name="out")
        sigma = self.param("sigma", nn.initializers.zeros, ())

        if self.use_pallas and dataflow in ("packed", "fused"):
            # PACKED dataflows: the 1x1 convs become matmuls on identity-
            # extracted SN kernels; the small pooled K-side (phi/g) is computed
            # here in a (B, D, H, W) layout; theta projection + softmax core +
            # out projection + residual run either as the XLA composition
            # around the packed Pallas core ('packed') or as ONE Pallas kernel
            # ('fused', kernels/attention.py:fused_nonlocal_block). Same param
            # tree, same function, differentiable (tested) — but both measured
            # SLOWER than 'nhwc' on v5e; see module docstring.
            from scrabblegan_tpu.kernels.attention import fused_nonlocal_block

            w_theta = _extract_kernel(theta_conv, c, self.dtype, train)
            w_phi = _extract_kernel(phi_conv, c, self.dtype, train)
            w_g = _extract_kernel(g_conv, c, self.dtype, train)
            w_out = _extract_kernel(out_conv, c_g, self.dtype, train)

            pg = jnp.einsum("bhwc,cd->bdhw", x,
                            jnp.concatenate([w_phi, w_g], axis=1))
            pg = _max_pool_2x2_packed(pg)                  # (B, Ca+Cg, H/2, W/2)
            phiT = pg[:, :c_attn].reshape(b, c_attn, -1)
            gT = pg[:, c_attn:].reshape(b, c_g, -1)

            out = fused_nonlocal_block(x.reshape(b, h * w, c), w_theta,
                                       phiT, gT, w_out,
                                       sigma.astype(self.dtype),
                                       fuse=dataflow == "fused")
            return out.reshape(b, h, w, c)

        if self.use_pallas and dataflow == "nhwc1":
            # 'nhwc1': the three 1x1 projections as ONE matmul with natural
            # bhwd output — x read once, one 128-lane-padded (B, H, W, 3C/4)
            # activation written instead of three (each independently padded
            # to 128 lanes in HBM). Layouts stay NHWC everywhere (what the
            # dataflow A/B showed XLA handles best); only the op count drops.
            w3 = jnp.concatenate(
                [_extract_kernel(conv, c, self.dtype, train)
                 for conv in (theta_conv, phi_conv, g_conv)], axis=1)
            proj = jnp.einsum("bhwc,cd->bhwd", x, w3)
            theta = proj[..., :c_attn]
            phi = proj[..., c_attn:2 * c_attn]
            g = proj[..., 2 * c_attn:]
        else:
            theta = theta_conv(x, train)
            phi = phi_conv(x, train)
            g = g_conv(x, train)

        phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
        g = nn.max_pool(g, (2, 2), strides=(2, 2))

        theta_flat = theta.reshape(b, h * w, c_attn)
        phi_flat = phi.reshape(b, (h // 2) * (w // 2), c_attn)
        g_flat = g.reshape(b, (h // 2) * (w // 2), c_g)

        if self.use_pallas:
            # 'nhwc' dataflow: only the attention core runs in the kernel's
            # channel-packed layout, via cheap boundary transposes of the
            # compact flattened operands.
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
        attn_g = out_conv(attn_g, train)

        return sigma.astype(self.dtype) * attn_g + x

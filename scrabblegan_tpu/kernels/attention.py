"""Fused Pallas TPU kernel for the SAGAN non-local attention core.

Computes softmax(theta @ phi^T) @ g in one VMEM-resident pass per (batch, q-block),
so the (Q, K) attention matrix — the largest intermediate in the whole model, up to
5120x1280 floats for 10-char words — never round-trips to HBM. This is the fusion
target SURVEY.md §5 identifies ("the attention block is the natural Pallas fusion
target"); numerics are tested against the pure-XLA einsum path in
tests/test_kernels.py.

Falls back to pure XLA when shapes don't meet the tiling preconditions.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# A/B toggle for perf measurement: SCRABBLEGAN_PALLAS_BWD=0 reverts the
# attention VJP to the XLA backward that materializes the (Q, K) matrices.
_USE_PALLAS_BWD = os.environ.get("SCRABBLEGAN_PALLAS_BWD", "1") != "0"

try:  # pltpu import fails on non-TPU-capable builds; fall back gracefully
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _attention_kernel(theta_ref, phi_ref, g_ref, out_ref):
    # theta: (1, QB, Ca), phi: (1, K, Ca), g: (1, K, Cg) -> out: (1, QB, Cg)
    # Matmuls run at the INPUT dtype (bf16 under the bf16 policy — 8x the MXU
    # rate of f32) with f32 accumulation; the softmax itself stays f32.
    theta = theta_ref[0]
    phi = phi_ref[0]
    g = g_ref[0]

    # fold ln->log2 conversion into the (QB, Ca) operand (free) so the
    # softmax exponential is a bare exp2 with no per-element multiply over
    # the (QB, K) score matrix; softmax is shift-invariant so the max
    # subtraction commutes with the scaling
    theta = theta * jnp.asarray(1.4426950408889634, theta.dtype)  # log2(e)
    scores = jax.lax.dot_general(
        theta, phi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (QB, K) f32, in log2 units
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp2(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    # defer the softmax normalization past the value matmul (exact by
    # linearity): divides the (QB, Cg) output instead of the (QB, K) weight
    # matrix — K/Cg fewer VPU divides (20x at len-5)
    out = jnp.dot(e.astype(theta.dtype), g, preferred_element_type=jnp.float32)
    out_ref[0] = (out / s).astype(out_ref.dtype)


def _xla_attention(theta, phi, g):
    scores = jnp.einsum("bqc,bkc->bqk", theta, phi, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(theta.dtype)
    return jnp.einsum("bqk,bkc->bqc", attn, g, preferred_element_type=jnp.float32).astype(
        theta.dtype
    )


def _pick_q_block(q: int, k: int) -> int:
    """Largest divisor-of-Q block whose f32 score tile fits a ~12MB VMEM budget.
    Fat blocks matter more than tiling finesse here: per-invocation grid
    overhead dominates these small-channel matmuls (measured on v5e). Any
    divisor is eligible (generator widths are 2^a*5*L, so the best block is
    often not a power of two: len-5 q=2560 -> 2560, one invocation per image)."""
    budget = 12 * 1024 * 1024
    max_qb = max(128, budget // (k * 4))
    best = 0
    for cand in range(1, min(q, max_qb) + 1):
        if q % cand == 0 and cand % 8 == 0:  # sublane-aligned
            best = cand
    return best or q


def _pallas_forward(theta, phi, g, interpret: bool = False):
    """interpret=True executes the kernel body (block indexing, q-block picker,
    f32 softmax) through the Pallas interpreter — how CI runs it on CPU."""
    b, q, ca = theta.shape
    k = phi.shape[1]
    cg = g.shape[2]
    q_block = _pick_q_block(q, k)
    grid = (b, q // q_block)
    return pl.pallas_call(
        _attention_kernel,
        out_shape=jax.ShapeDtypeStruct((b, q, cg), theta.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, ca), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, k, ca), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, k, cg), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_block, cg), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(theta, phi, g)


def _attention_bwd_kernel(theta_ref, phi_ref, g_ref, dout_ref,
                          dtheta_ref, dphi_ref, dg_ref):
    """Fused flash-style backward: per (batch, q-block) grid step, recompute
    the attention row block A = softmax(theta phi^T) in VMEM, apply the
    softmax VJP, and emit all three input grads. d_phi / d_g map to the SAME
    output block for every q-block step (index constant in j), so Mosaic keeps
    them VMEM-resident across the sequential inner grid dimension and the
    kernel accumulates into them — the (Q, K) matrices never touch HBM."""
    j = pl.program_id(1)
    theta = theta_ref[0].astype(jnp.float32)  # (QB, Ca)
    phi = phi_ref[0].astype(jnp.float32)      # (K, Ca)
    g = g_ref[0].astype(jnp.float32)          # (K, Cg)
    dout = dout_ref[0].astype(jnp.float32)    # (QB, Cg)

    scores = jax.lax.dot_general(
        theta, phi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # (QB, K)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # attn = e * r, never formed

    d_attn = jax.lax.dot_general(
        dout, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # (QB, K)
    # softmax VJP dS = A*(dA - sum_k(A*dA)), with A = e*r factored so the
    # row-broadcast normalization folds into the (QB, 1) constants:
    # dS = e * ((dA - r*sum_k(e*dA)) * r) — one fewer (QB, K) pass
    c = jnp.sum(e * d_attn, axis=-1, keepdims=True) * r
    d_scores = e * ((d_attn - c) * r)

    dtheta_ref[0] = jnp.dot(
        d_scores, phi, preferred_element_type=jnp.float32
    ).astype(dtheta_ref.dtype)

    @pl.when(j == 0)
    def _():
        dphi_ref[0] = jnp.zeros_like(dphi_ref[0])
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    dphi_ref[0] += jax.lax.dot_general(
        d_scores, theta, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dphi_ref.dtype)  # (K, Ca)
    # dg = attn^T dout = e^T (r*dout): the per-q normalization folds into the
    # small (QB, Cg) operand since the contraction runs over q
    dg_ref[0] += jax.lax.dot_general(
        e, dout * r, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dg_ref.dtype)    # (K, Cg)


def _pallas_backward(theta, phi, g, d_out, interpret: bool = False):
    b, q, ca = theta.shape
    k = phi.shape[1]
    cg = g.shape[2]
    # ~four (QB, K) f32 intermediates live at once (scores/e, d_attn,
    # d_scores, matmul staging) -> quarter the forward budget
    q_block = _pick_q_block(q, 4 * k)
    grid = (b, q // q_block)
    d_theta, d_phi, d_g = pl.pallas_call(
        _attention_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, q, ca), jnp.float32),
            jax.ShapeDtypeStruct((b, k, ca), jnp.float32),
            jax.ShapeDtypeStruct((b, k, cg), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, ca), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, k, ca), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, k, cg), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, q_block, cg), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, q_block, ca), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, k, ca), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, k, cg), lambda i, j: (i, 0, 0)),
        ),
        interpret=interpret,
    )(theta, phi, g, d_out)
    return (d_theta.astype(theta.dtype), d_phi.astype(phi.dtype),
            d_g.astype(g.dtype))


@jax.custom_vjp
def _attention_op(theta, phi, g):
    return _pallas_forward(theta, phi, g)


def _attention_fwd(theta, phi, g):
    return _pallas_forward(theta, phi, g), (theta, phi, g)


def _xla_backward(theta, phi, g, d_out):
    """Reference backward: recompute attention weights via the XLA path and
    differentiate analytically — materializes the (Q, K) matrices in HBM."""
    scores = jnp.einsum("bqc,bkc->bqk", theta, phi,
                        preferred_element_type=jnp.float32).astype(jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1)
    d_out32 = d_out.astype(jnp.float32)
    g32 = g.astype(jnp.float32)

    d_g = jnp.einsum("bqk,bqc->bkc", attn, d_out32)
    d_attn = jnp.einsum("bqc,bkc->bqk", d_out32, g32)
    # softmax VJP: dS = A * (dA - sum_k(A * dA))
    d_scores = attn * (d_attn - jnp.sum(attn * d_attn, axis=-1, keepdims=True))
    d_theta = jnp.einsum("bqk,bkc->bqc", d_scores, phi.astype(jnp.float32))
    d_phi = jnp.einsum("bqk,bqc->bkc", d_scores, theta.astype(jnp.float32))
    return (d_theta.astype(theta.dtype), d_phi.astype(phi.dtype),
            d_g.astype(g.dtype))


def _attention_bwd(residuals, d_out):
    theta, phi, g = residuals
    q, k = theta.shape[1], phi.shape[1]
    if _USE_PALLAS_BWD and q % _pick_q_block(q, 4 * k) == 0:
        return _pallas_backward(theta, phi, g, d_out)
    return _xla_backward(theta, phi, g, d_out)


_attention_op.defvjp(_attention_fwd, _attention_bwd)


@functools.partial(jax.jit, static_argnames=())
def nonlocal_attention(theta, phi, g):
    """theta: (B, Q, Ca); phi: (B, K, Ca); g: (B, K, Cg) -> (B, Q, Cg).

    Non-scaled dot-product attention with softmax over K, matching the reference's
    NonLocalBlock math (arch_ops.py:51-61: softmax(theta phi^T) g, no 1/sqrt(d)).
    Differentiable: the fused Pallas forward carries a custom VJP whose backward
    recomputes the attention weights in XLA."""
    q = theta.shape[1]
    q_block = _pick_q_block(q, phi.shape[1])
    on_tpu = jax.default_backend() == "tpu" or "axon" in jax.default_backend()
    if not _HAS_PLTPU or not on_tpu or q % q_block != 0:
        return _xla_attention(theta, phi, g)
    return _attention_op(theta, phi, g)

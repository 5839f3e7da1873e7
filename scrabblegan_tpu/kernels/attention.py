"""Fused Pallas TPU kernel for the SAGAN non-local attention core.

Computes softmax(theta @ phi^T) @ g in one VMEM-resident pass per (batch, q-block),
so the (Q, K) attention matrix — the largest intermediate in the whole model, up to
5120x1280 floats for 10-char words — never round-trips to HBM. This is the fusion
target SURVEY.md §5 identifies ("the attention block is the natural Pallas fusion
target"); numerics are tested against the pure-XLA einsum path in
tests/test_kernels.py.

Layout: the kernel operands are CHANNEL-PACKED — theta^T (B, Ca, Q),
phi^T (B, Ca, K), g^T (B, Cg, K), out^T (B, Cg, Q) — so the long spatial axis
sits in the 128-wide lane dimension. In the natural (B, N, C) layout the
minor C axis (8 or 32 channels) is padded to 128 lanes in HBM: at batch 1024
len 5 the theta operand alone inflates 16x to 671MB and its layout copy +
kernel read cost ~2ms (profiler-measured). The packed form is compact; the
boundary transposes are cheap relayouts of the un-padded data.

Softmax micro-optimizations (all exact, measured on v5e):
- normalization deferred past the value matmul — divides the (Cg, QB) output,
  not the (QB, K) weight matrix (20x fewer divides at len-5);
- exp2 with log2(e) folded into the small theta operand;
- the backward never materializes attn = softmax(scores): the normalization
  folds into per-row constants and the small d_out operand.

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

# SCRABBLEGAN_FUSED_BLOCK=0 reverts fused_nonlocal_block's forward to the
# composition (theta einsum + packed attention core + out einsum) — both an
# A/B lever and a safety hatch should the whole-block kernel mis-lower on a
# new compiler version.
_USE_FUSED_BLOCK = os.environ.get("SCRABBLEGAN_FUSED_BLOCK", "1") != "0"

_LOG2E = 1.4426950408889634


def _on_tpu() -> bool:
    """True when ops would lower for a TPU device RIGHT HERE. The default
    BACKEND is not enough: under `jax.default_device(cpu)` (host-side init,
    bench param init) the process backend is still the TPU tunnel but the
    enclosed computation compiles for CPU, where a non-interpret pallas_call
    fails with "Only interpret mode is supported on CPU backend".

    Known limitation (perf-only, ADVICE r3): this is a trace-time Python
    branch, not a per-device lowering check. A computation explicitly placed
    on the TPU via jit's device/sharding args while a CPU default_device is
    active (or a trace cached under the opposite context) takes the XLA
    fallback path — numerically identical, just without the fused kernel.
    No repo code path does that; if explicit-placement use appears, key this
    on the actual lowering platform instead."""
    dev = jax.config.jax_default_device
    if dev is not None:
        plat = getattr(dev, "platform", str(dev))
        return plat == "tpu" or "axon" in plat
    plat = jax.default_backend()
    return plat == "tpu" or "axon" in plat

try:  # pltpu import fails on non-TPU-capable builds; fall back gracefully
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _scores_dot(aT, bT):
    """Scores matmul aT^T @ bT contracting dim 0, always f32-accurate.

    The exp downstream amplifies score error into ~2e-2 output error if the
    MXU runs a single truncated-bf16 pass (Mosaic's f32 DEFAULT, measured) —
    and Mosaic supports no multi-pass precision for f32 short of HIGHEST,
    which costs ~4% of the train step. Instead: bf16x3 as ONE matmul, by
    stacking the hi/lo error-splits along the contraction axis —
    [a_hi; a_lo; a_hi] @ [b_hi; b_hi; b_lo] = a_hi b_hi + a_lo b_hi + a_hi b_lo
    (the dropped lo·lo term is ~2^-16 relative). The contraction grows 8->24
    lanes, both under the MXU's 128-deep pass, so the accurate form costs the
    same single pass as the truncated one; the splits touch only the SMALL
    (C, N) operands, not the (QB, K) scores. Measured end-to-end parity:
    ~7.5e-3 vs an f32-exact reference — the residual is the VALUE matmul's
    single bf16 pass, shared by every other matmul in the model; XLA's own
    DEFAULT f32 attention is ~4e-2 off the same reference. (HIGHEST on the
    scores matmul alone reaches 2e-6 but costs ~4% of the train step: six
    128-deep passes turn this VPU-bound kernel MXU-bound.)"""
    if aT.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            aT, bT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    a_hi = aT.astype(jnp.bfloat16)
    a_lo = (aT - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = bT.astype(jnp.bfloat16)
    b_lo = (bT - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    a3 = jnp.concatenate([a_hi, a_lo, a_hi], axis=0)
    b3 = jnp.concatenate([b_hi, b_hi, b_lo], axis=0)
    return jax.lax.dot_general(
        a3, b3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _attention_kernel(thetaT_ref, phiT_ref, gT_ref, outT_ref):
    # thetaT: (1, Ca, QB), phiT: (1, Ca, K), gT: (1, Cg, K) -> outT: (1, Cg, QB)
    # Matmuls run at the INPUT dtype (bf16 under the bf16 policy — 8x the MXU
    # rate of f32) with f32 accumulation; the softmax itself stays f32.
    # The kernel is VPU-bound (the matmuls are ~0.7us/step, the softmax ~3.4us
    # at len-5 b1024) so the VPU does exactly TWO passes over the (QB, K)
    # scores: the max reduce and one fused subtract+exp2+convert. The softmax
    # divisor sum(e) rides the MXU instead: a ones row appended to gT makes
    # the value matmul emit [out; s] in one shot.
    dt = thetaT_ref.dtype
    thetaT = thetaT_ref[0] * jnp.asarray(_LOG2E, dt)
    scores = _scores_dot(thetaT, phiT_ref[0])  # (QB, K) f32, in log2 units
    m = jnp.max(scores, axis=-1, keepdims=True)
    if dt == jnp.bfloat16:
        # bf16: the numerator matmul already quantizes e to bf16, so the
        # divisor can share that quantization and ride the MXU for free
        e = jnp.exp2(scores - m).astype(dt)  # one fused VPU pass
        cg = gT_ref.shape[1]
        gext = jnp.concatenate(
            [gT_ref[0], jnp.ones((1, e.shape[-1]), dt)], axis=0)
        out_s = jax.lax.dot_general(
            gext, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Cg+1, QB): rows 0..Cg-1 = unnormalized out, row Cg = sum(e)
        outT_ref[0] = (out_s[:cg] * (1.0 / out_s[cg])[None, :]).astype(
            outT_ref.dtype)
    else:
        # f32: keep the divisor exact on the VPU (bf16-quantizing e for an
        # MXU divisor would throw away f32's precision advantage)
        e = jnp.exp2(scores - m)
        s = jnp.sum(e, axis=-1)  # (QB,) — a lane vector
        outT = jax.lax.dot_general(
            gT_ref[0], e.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Cg, QB)
        outT_ref[0] = (outT * (1.0 / s)[None, :]).astype(outT_ref.dtype)


def _xla_attention(theta, phi, g):
    scores = jnp.einsum("bqc,bkc->bqk", theta, phi, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(theta.dtype)
    return jnp.einsum("bqk,bkc->bqc", attn, g, preferred_element_type=jnp.float32).astype(
        theta.dtype
    )


def _pick_q_block(q: int, k: int) -> int:
    """Largest divisor-of-Q block whose f32 score tile fits a ~12MB VMEM budget
    (16MB scoped limit on v5e). Fat blocks matter more than tiling finesse
    here: per-invocation grid overhead dominates these small-channel matmuls
    (measured on v5e). Any 128-aligned divisor is eligible (generator widths
    are 2^a*5*L, so the best block is often not a power of two: len-5
    q=2560 -> 2560, one invocation per image)."""
    budget = 12 * 1024 * 1024
    max_qb = max(128, budget // (k * 4))
    best = 0
    for cand in range(128, min(q, max_qb) + 1, 128):
        if q % cand == 0:
            best = cand
    return best or q


def _pallas_forward(thetaT, phiT, gT, interpret: bool = False):
    """interpret=True executes the kernel body (block indexing, q-block picker,
    f32 softmax) through the Pallas interpreter — how CI runs it on CPU."""
    b, ca, q = thetaT.shape
    k = phiT.shape[2]
    cg = gT.shape[1]
    q_block = _pick_q_block(q, k)
    grid = (b, q // q_block)
    return pl.pallas_call(
        _attention_kernel,
        out_shape=jax.ShapeDtypeStruct((b, cg, q), thetaT.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ca, q_block), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, ca, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, cg, k), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cg, q_block), lambda i, j: (i, 0, j)),
        interpret=interpret,
    )(thetaT, phiT, gT)


def _attention_bwd_kernel(thetaT_ref, phiT_ref, gT_ref, doutT_ref,
                          dthetaT_ref, dphiT_ref, dgT_ref):
    """Fused flash-style backward: per (batch, q-block) grid step, recompute
    the attention scores in VMEM, apply the softmax VJP, and emit all three
    input grads. d_phi / d_g map to the SAME output block for every q-block
    step (index constant in j), so Mosaic keeps them VMEM-resident across the
    sequential inner grid dimension and the kernel accumulates into them —
    the (Q, K) matrices never touch HBM."""
    j = pl.program_id(1)
    # The recomputed scores matmul is f32-accurate for f32 residuals (see
    # _scores_dot: exp amplifies score error); the four gradient matmuls are
    # linear in their error and run the MXU's fast path like every other
    # matmul in the model (multi-pass on them costs ~9% of the train step).
    thetaT = thetaT_ref[0].astype(jnp.float32)  # (Ca, QB)
    phiT = phiT_ref[0].astype(jnp.float32)      # (Ca, K)
    gT = gT_ref[0].astype(jnp.float32)          # (Cg, K)
    doutT = doutT_ref[0].astype(jnp.float32)    # (Cg, QB)

    scores = _scores_dot(thetaT_ref[0], phiT_ref[0])  # (QB, K)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # (QB, 1)
    attn = e * r  # reused by the VJP below AND the dg matmul — built once

    d_attn = jax.lax.dot_general(
        doutT, gT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # (QB, K)
    # softmax VJP: dS = A * (dA - sum_k(A * dA))
    c = jnp.sum(attn * d_attn, axis=-1, keepdims=True)
    d_scores = attn * (d_attn - c)

    dthetaT_ref[0] = jax.lax.dot_general(
        phiT, d_scores, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dthetaT_ref.dtype)  # (Ca, QB)

    @pl.when(j == 0)
    def _():
        dphiT_ref[0] = jnp.zeros_like(dphiT_ref[0])
        dgT_ref[0] = jnp.zeros_like(dgT_ref[0])

    dphiT_ref[0] += jax.lax.dot_general(
        thetaT, d_scores, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dphiT_ref.dtype)  # (Ca, K)
    dgT_ref[0] += jax.lax.dot_general(
        doutT, attn, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dgT_ref.dtype)    # (Cg, K)


def _pallas_backward(thetaT, phiT, gT, d_outT, interpret: bool = False):
    b, ca, q = thetaT.shape
    k = phiT.shape[2]
    cg = gT.shape[1]
    # ~four (QB, K) f32 intermediates live at once (scores/e, d_attn,
    # d_scores, matmul staging) -> quarter the forward budget
    q_block = _pick_q_block(q, 4 * k)
    grid = (b, q // q_block)
    d_thetaT, d_phiT, d_gT = pl.pallas_call(
        _attention_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, ca, q), jnp.float32),
            jax.ShapeDtypeStruct((b, ca, k), jnp.float32),
            jax.ShapeDtypeStruct((b, cg, k), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ca, q_block), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, ca, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, cg, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, cg, q_block), lambda i, j: (i, 0, j)),
        ],
        out_specs=(
            pl.BlockSpec((1, ca, q_block), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, ca, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, cg, k), lambda i, j: (i, 0, 0)),
        ),
        interpret=interpret,
    )(thetaT, phiT, gT, d_outT)
    return (d_thetaT.astype(thetaT.dtype), d_phiT.astype(phiT.dtype),
            d_gT.astype(gT.dtype))


@jax.custom_vjp
def _attention_op(thetaT, phiT, gT):
    return _pallas_forward(thetaT, phiT, gT)


def _attention_fwd(thetaT, phiT, gT):
    return _pallas_forward(thetaT, phiT, gT), (thetaT, phiT, gT)


def _xla_backward(thetaT, phiT, gT, d_outT):
    """Reference backward: recompute attention weights via the XLA path and
    differentiate analytically — materializes the (Q, K) matrices in HBM."""
    scores = jnp.einsum("bcq,bck->bqk", thetaT, phiT,
                        preferred_element_type=jnp.float32).astype(jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1)
    d_out32 = d_outT.astype(jnp.float32)
    g32 = gT.astype(jnp.float32)

    d_gT = jnp.einsum("bqk,bcq->bck", attn, d_out32)
    d_attn = jnp.einsum("bcq,bck->bqk", d_out32, g32)
    # softmax VJP: dS = A * (dA - sum_k(A * dA))
    d_scores = attn * (d_attn - jnp.sum(attn * d_attn, axis=-1, keepdims=True))
    d_thetaT = jnp.einsum("bqk,bck->bcq", d_scores, phiT.astype(jnp.float32))
    d_phiT = jnp.einsum("bqk,bcq->bck", d_scores, thetaT.astype(jnp.float32))
    return (d_thetaT.astype(thetaT.dtype), d_phiT.astype(phiT.dtype),
            d_gT.astype(gT.dtype))


def _attention_bwd(residuals, d_outT):
    thetaT, phiT, gT = residuals
    q, k = thetaT.shape[2], phiT.shape[2]
    if _USE_PALLAS_BWD and q % _pick_q_block(q, 4 * k) == 0:
        return _pallas_backward(thetaT, phiT, gT, d_outT)
    return _xla_backward(thetaT, phiT, gT, d_outT)


_attention_op.defvjp(_attention_fwd, _attention_bwd)


def _scores_dot_nt(a, bT):
    """Scores matmul a @ bT contracting a's dim 1 with bT's dim 0, f32-accurate.

    Same bf16x3 error-split trick as _scores_dot (see its docstring), for the
    fused-block kernel whose theta tile is naturally (QB, Ca)."""
    if a.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            a, bT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = bT.astype(jnp.bfloat16)
    b_lo = (bT - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    a3 = jnp.concatenate([a_hi, a_lo, a_hi], axis=1)
    b3 = jnp.concatenate([b_hi, b_hi, b_lo], axis=0)
    return jax.lax.dot_general(
        a3, b3, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _fused_block_kernel(x_ref, wt_ref, phiT_ref, gT_ref, wo_ref, out_ref):
    """Whole-NonLocalBlock fusion around the attention core.

    Per (batch, q-block) grid step, from VMEM-resident inputs:
      theta tile  = x_q @ w_theta          (w_theta arrives log2(e)-folded)
      scores      = theta @ phiT           (f32-accurate, see _scores_dot_nt)
      softmax     = deferred-normalization exp2, divisor on the MXU (bf16)
      out tile    = attn_out^T @ w_out + x_q   (w_out arrives sigma-folded)
    x is NHWC-flattened (B, N, C) — the kernel's contractions consume it
    directly, so neither the lane-padded (B, N, 8/32) projection activations
    nor any (B, C, N) boundary transpose of x ever exist in HBM. phiT/gT are
    the small pooled K-side operands, computed outside (pooling needs the
    (H, W) structure; they are ~1/32 and ~1/8 of x). The q-block tile of x
    arrives via the BlockSpec (Mosaic has no in-kernel dynamic_slice)."""
    xq = x_ref[0]                                           # (QB, C)
    dt = xq.dtype

    theta = jax.lax.dot_general(
        xq, wt_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (QB, Ca) f32
    theta = theta.astype(dt)  # mirror the XLA composition's projection dtype
    scores = _scores_dot_nt(theta, phiT_ref[0])             # (QB, K) f32, log2 units
    m = jnp.max(scores, axis=-1, keepdims=True)
    cg = gT_ref.shape[1]
    if dt == jnp.bfloat16:
        e = jnp.exp2(scores - m).astype(dt)                 # one fused VPU pass
        gext = jnp.concatenate(
            [gT_ref[0], jnp.ones((1, e.shape[-1]), dt)], axis=0)
        out_s = jax.lax.dot_general(
            gext, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (Cg+1, QB)
        attn_out = out_s[:cg] * (1.0 / out_s[cg])[None, :]  # (Cg, QB) f32
    else:
        e = jnp.exp2(scores - m)
        s = jnp.sum(e, axis=-1)                             # (QB,)
        outT = jax.lax.dot_general(
            gT_ref[0], e.astype(dt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (Cg, QB)
        attn_out = outT * (1.0 / s)[None, :]
    out_q = jax.lax.dot_general(
        attn_out.astype(dt), wo_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (QB, C)
    out_ref[0] = (out_q.astype(dt) + xq).astype(out_ref.dtype)


def _fused_block_forward(x_flat, w_theta, phiT, gT, w_out_s,
                         interpret: bool = False):
    b, n, c = x_flat.shape
    ca = w_theta.shape[1]
    cg, k = gT.shape[1], gT.shape[2]
    q_block = _pick_q_block(n, k)
    grid = (b, n // q_block)
    wt_log2 = (w_theta.astype(jnp.float32) * _LOG2E).astype(w_theta.dtype)
    return pl.pallas_call(
        _fused_block_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x_flat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, ca), lambda i, j: (0, 0)),
            pl.BlockSpec((1, ca, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, cg, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((cg, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_block, c), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(x_flat, wt_log2, phiT, gT, w_out_s)


def _fused_block_reference(x_flat, w_theta, phiT, gT, w_out_s):
    """Pure-JAX composition computing the same function as the fused kernel:
    theta projection -> packed attention core -> out projection -> residual.
    Used as the off-TPU fallback AND (via jax.vjp) as the fused op's backward,
    so training gradients route through the flash-style Pallas backward of
    `nonlocal_attention_packed` where available."""
    dt = x_flat.dtype
    thetaT = jnp.einsum("cd,bnc->bdn", w_theta, x_flat).astype(dt)  # (B,Ca,N)
    attn_outT = nonlocal_attention_packed(thetaT, phiT, gT)         # (B,Cg,N)
    out = jnp.einsum("dc,bdn->bnc", w_out_s, attn_outT,
                     preferred_element_type=jnp.float32).astype(dt)
    return out + x_flat


@jax.custom_vjp
def _fused_block_op(x_flat, w_theta, phiT, gT, w_out_s):
    return _fused_block_forward(x_flat, w_theta, phiT, gT, w_out_s)


def _fused_block_fwd(x_flat, w_theta, phiT, gT, w_out_s):
    return (_fused_block_forward(x_flat, w_theta, phiT, gT, w_out_s),
            (x_flat, w_theta, phiT, gT, w_out_s))


def _fused_block_bwd(residuals, d_out):
    _, vjp = jax.vjp(_fused_block_reference, *residuals)
    return vjp(d_out)


_fused_block_op.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_nonlocal_block(x_flat, w_theta, phiT, gT, w_out, sigma,
                         fuse: bool = True):
    """x_flat (B, N, C) + sigma * Proj_out(Attend(x_flat w_theta, phiT, gT)).

    The full non-local block around precomputed pooled K-side operands.
    With fuse=True, theta/out projections, softmax core, and the residual run
    as ONE Pallas kernel on TPU; with fuse=False (the 'packed' dataflow), the
    identical composition runs in XLA around the packed Pallas attention core.
    Off-TPU or at non-tiling shapes both fall back to the XLA composition.
    Differentiable everywhere — the backward is the VJP of the composition,
    which itself uses the fused Pallas attention backward on TPU."""
    n, k = x_flat.shape[1], phiT.shape[2]
    w_out_s = (w_out.astype(jnp.float32)
               * sigma.astype(jnp.float32)).astype(w_out.dtype)
    q_block = _pick_q_block(n, k)
    on_tpu = _on_tpu()
    if (not fuse or not _USE_FUSED_BLOCK or not _HAS_PLTPU or not on_tpu
            or n % q_block != 0 or q_block % 128 != 0):
        return _fused_block_reference(x_flat, w_theta, phiT, gT, w_out_s)
    return _fused_block_op(x_flat, w_theta, phiT, gT, w_out_s)


def nonlocal_attention_packed(thetaT, phiT, gT):
    """Channel-packed entry: thetaT (B, Ca, Q); phiT (B, Ca, K); gT (B, Cg, K)
    -> outT (B, Cg, Q). The operands stay in the kernel's native layout end to
    end — callers that already hold packed activations (ops/attention.py's
    packed projection path) avoid the boundary transposes entirely.

    Falls back to the pure-XLA einsum path (via boundary transposes) off-TPU
    or when shapes miss the tiling preconditions; numerics match either way."""
    q, k = thetaT.shape[2], phiT.shape[2]
    q_block = _pick_q_block(q, k)
    on_tpu = _on_tpu()
    if not _HAS_PLTPU or not on_tpu or q % q_block != 0 or q_block % 128 != 0:
        out = _xla_attention(jnp.swapaxes(thetaT, 1, 2),
                             jnp.swapaxes(phiT, 1, 2), jnp.swapaxes(gT, 1, 2))
        return jnp.swapaxes(out, 1, 2)
    return _attention_op(thetaT, phiT, gT)


@functools.partial(jax.jit, static_argnames=())
def nonlocal_attention(theta, phi, g):
    """theta: (B, Q, Ca); phi: (B, K, Ca); g: (B, K, Cg) -> (B, Q, Cg).

    Non-scaled dot-product attention with softmax over K, matching the reference's
    NonLocalBlock math (arch_ops.py:51-61: softmax(theta phi^T) g, no 1/sqrt(d)).
    Differentiable: the fused Pallas forward carries a custom VJP.

    Internally channel-packed (see module docstring): the (B, N, C) operands
    are transposed to (B, C, N) at the boundary so neither HBM nor the kernel
    ever touches lane-padded layouts; JAX differentiates the transposes."""
    q, k = theta.shape[1], phi.shape[1]
    q_block = _pick_q_block(q, k)
    on_tpu = _on_tpu()
    if not _HAS_PLTPU or not on_tpu or q % q_block != 0 or q_block % 128 != 0:
        return _xla_attention(theta, phi, g)
    outT = _attention_op(jnp.swapaxes(theta, 1, 2), jnp.swapaxes(phi, 1, 2),
                         jnp.swapaxes(g, 1, 2))
    return jnp.swapaxes(outT, 1, 2)

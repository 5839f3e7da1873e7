"""Pallas kernel numerics tests against the pure-XLA reference path (SURVEY.md §7:
kernels "gated behind flags with XLA fallbacks and numerics tests").

The kernels operate on CHANNEL-PACKED operands — (B, C, N) with the long axis
in lanes (see kernels/attention.py module docstring) — so tests transpose at
the boundary exactly like `nonlocal_attention` does."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scrabblegan_tpu.kernels.attention import _xla_attention, nonlocal_attention


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _T(a):
    return jnp.swapaxes(a, 1, 2)


class TestNonlocalAttention:
    @pytest.mark.parametrize("q,k", [(512, 128), (1280, 320)])
    def test_matches_xla_path(self, q, k):
        """On CPU the kernel runs via the interpret/fallback path; numerics must
        match the einsum+softmax reference."""
        theta = _rand(0, (2, q, 8))
        phi = _rand(1, (2, k, 8))
        g = _rand(2, (2, k, 32))
        out = nonlocal_attention(theta, phi, g)
        ref = _xla_attention(theta, phi, g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                                   atol=1e-5)

    def test_gradients_match_xla_path(self):
        """The custom backward rule (packed layouts) must agree with autodiff
        through the einsum path."""
        from scrabblegan_tpu.kernels.attention import _xla_backward

        theta = _rand(6, (1, 128, 8))
        phi = _rand(7, (1, 32, 8))
        g = _rand(8, (1, 32, 16))

        out, vjp_ref = jax.vjp(_xla_attention, theta, phi, g)
        d_out = jnp.cos(out)  # d sum(sin(out)) / d out
        ref_grads = vjp_ref(d_out)
        custom = _xla_backward(_T(theta), _T(phi), _T(g), _T(d_out))
        for a, b in zip(custom, ref_grads):
            np.testing.assert_allclose(np.asarray(_T(a)), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("q,k", [(512, 128), (5120, 1280)])
    def test_pallas_backward_kernel_interpret(self, q, k):
        """The fused Pallas backward (recompute + softmax VJP + cross-q-block
        d_phi/d_g accumulation) must match autodiff through the XLA forward.
        The 5120/1280 case is the len-10 shape with multiple q-blocks, which
        exercises the j==0-init / += accumulation path."""
        from scrabblegan_tpu.kernels.attention import _pallas_backward

        theta = _rand(20, (2, q, 8))
        phi = _rand(21, (2, k, 8))
        g = _rand(22, (2, k, 32))
        out, vjp_ref = jax.vjp(_xla_attention, theta, phi, g)
        d_out = jnp.cos(out)
        ref_grads = vjp_ref(d_out)
        got = _pallas_backward(_T(theta), _T(phi), _T(g), _T(d_out),
                               interpret=True)
        for a, b in zip(got, ref_grads):
            np.testing.assert_allclose(np.asarray(_T(a)), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("q,k,qb_splits", [(512, 128, 1), (1280, 320, 5),
                                               (5120, 1280, 10)])
    def test_kernel_body_in_interpret_mode(self, q, k, qb_splits):
        """Execute the ACTUAL Pallas kernel (block indexing, fat q-block picker,
        f32 softmax) via the interpreter on CPU — fails if _attention_kernel's
        math or the BlockSpecs regress (VERDICT r1 weak #3). The 5120/1280 case
        is the real len-10 generator attention shape and spans >1 q-block."""
        from scrabblegan_tpu.kernels.attention import _pallas_forward, _pick_q_block

        theta = _rand(10, (2, q, 8))
        phi = _rand(11, (2, k, 8))
        g = _rand(12, (2, k, 32))
        assert q % _pick_q_block(q, k) == 0
        out = _pallas_forward(_T(theta), _T(phi), _T(g), interpret=True)
        ref = _xla_attention(theta, phi, g)
        # the f32 scores matmul runs stacked bf16x3 (kernel _scores_dot):
        # dropped lo*lo term bounds relative score error at ~2^-16, amplified
        # by the exp into ~1e-4 on outputs
        np.testing.assert_allclose(np.asarray(_T(out)), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_kernel_body_bf16_inputs_interpret(self):
        """bf16 policy path: inputs bf16, softmax must still be f32 internally."""
        from scrabblegan_tpu.kernels.attention import _pallas_forward

        theta = _rand(13, (1, 256, 8)).astype(jnp.bfloat16)
        phi = _rand(14, (1, 64, 8)).astype(jnp.bfloat16)
        g = _rand(15, (1, 64, 16)).astype(jnp.bfloat16)
        out = _pallas_forward(_T(theta), _T(phi), _T(g), interpret=True)
        ref = _xla_attention(theta, phi, g)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(_T(out), np.float32),
                                   np.asarray(ref, np.float32), rtol=2e-2,
                                   atol=2e-2)

    @pytest.mark.parametrize("q,k,dt,tol", [
        # f32 tol: the kernel folds log2(e) into w_theta (one extra f32
        # rounding on the weights) vs the composition's post-matmul scale
        (512, 128, jnp.float32, 5e-4),
        (2560, 640, jnp.float32, 5e-4),    # len-5 generator block shape
        (5120, 1280, jnp.float32, 5e-4),   # len-10, spans >1 q-block
        # bf16: the kernel's e/divisor are bf16 (MXU-rided softmax sum) while
        # the CPU composition keeps the softmax f32 — a few-ulp disagreement
        # on ~0.1% of elements is the expected quantization, not a regression
        (512, 128, jnp.bfloat16, 1e-1),
    ])
    def test_fused_block_kernel_interpret(self, q, k, dt, tol):
        """The whole-block fused kernel (theta proj -> softmax core -> out
        proj -> residual over NHWC x) must match the pure-JAX composition
        that also serves as its backward."""
        from scrabblegan_tpu.kernels.attention import (
            _fused_block_forward, _fused_block_reference)

        b, c, ca, cg = 2, 64, 8, 32
        x = (_rand(30, (b, q, c))).astype(dt)
        wt = (0.2 * _rand(31, (c, ca))).astype(dt)
        phiT = _rand(32, (b, ca, k)).astype(dt)
        gT = _rand(33, (b, cg, k)).astype(dt)
        wo = (0.2 * _rand(34, (cg, c))).astype(dt)
        got = _fused_block_forward(x, wt, phiT, gT, wo, interpret=True)
        ref = _fused_block_reference(x, wt, phiT, gT, wo)
        assert got.dtype == dt
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=tol, atol=tol)

    def test_fused_block_grads_route_through_composition(self):
        """fused_nonlocal_block must be differentiable in all six args; on CPU
        it computes via the composition, whose grads = autodiff exactly."""
        from scrabblegan_tpu.kernels.attention import (
            _fused_block_reference, fused_nonlocal_block)

        b, q, k, c, ca, cg = 1, 256, 64, 64, 8, 32
        x = _rand(40, (b, q, c))
        wt = 0.2 * _rand(41, (c, ca))
        phiT = _rand(42, (b, ca, k))
        gT = _rand(43, (b, cg, k))
        wo = 0.2 * _rand(44, (cg, c))
        sigma = jnp.asarray(0.7)

        def f(*args):
            return jnp.sum(jnp.sin(fused_nonlocal_block(*args)))

        def f_ref(x, wt, phiT, gT, wo, sigma):
            return jnp.sum(jnp.sin(
                _fused_block_reference(x, wt, phiT, gT, wo * sigma)))

        got = jax.grad(f, argnums=tuple(range(6)))(x, wt, phiT, gT, wo, sigma)
        ref = jax.grad(f_ref, argnums=tuple(range(6)))(x, wt, phiT, gT, wo, sigma)
        for a, b_ in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
    def test_kernels_lower_for_tpu(self, dt):
        """Cross-platform Mosaic lowering regression gate: jax.export with
        platforms=['tpu'] runs the ACTUAL pallas->Mosaic lowering on CPU —
        the step that rejected dynamic_slice inside the fused-block kernel
        (NotImplementedError at jit time on the real chip) while interpret
        mode passed. Fails on any primitive/BlockSpec Mosaic can't lower, at
        the real len-5 attention shapes, without needing a TPU."""
        from jax import export

        from scrabblegan_tpu.kernels.attention import (
            _fused_block_forward, _pallas_backward, _pallas_forward)

        b, q, k, c, ca, cg = 2, 2560, 640, 64, 8, 32
        x = jnp.zeros((b, q, c), dt)
        wt = jnp.zeros((c, ca), dt)
        thetaT = jnp.zeros((b, ca, q), dt)
        phiT = jnp.zeros((b, ca, k), dt)
        gT = jnp.zeros((b, cg, k), dt)
        doutT = jnp.zeros((b, cg, q), dt)
        wo = jnp.zeros((cg, c), dt)
        for fn, args in [
            (_pallas_forward, (thetaT, phiT, gT)),
            (_pallas_backward, (thetaT, phiT, gT, doutT)),
            (_fused_block_forward, (x, wt, phiT, gT, wo)),
        ]:
            exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
            assert exp.platforms == ("tpu",)

    def test_rows_are_convex_combinations(self):
        """softmax attention output must lie within [min(g), max(g)] per channel."""
        theta = _rand(3, (1, 256, 8))
        phi = _rand(4, (1, 64, 8))
        g = _rand(5, (1, 64, 32))
        out = np.asarray(nonlocal_attention(theta, phi, g))
        assert out.max() <= float(g.max()) + 1e-5
        assert out.min() >= float(g.min()) - 1e-5

    def test_scores_dot_stacked_bf16x3_accuracy(self):
        """The f32 scores matmul runs stacked bf16x3 (one MXU pass carrying
        hi/lo error-splits along the contraction axis). Pin (a) its accuracy
        vs an f64 reference and (b) that it beats a single truncated-bf16
        pass by >=10x — the property that justifies the construction."""
        from scrabblegan_tpu.kernels.attention import _scores_dot

        a = np.asarray(_rand(20, (8, 512)), np.float64)
        b = np.asarray(_rand(21, (8, 640)), np.float64)
        exact = a.T @ b
        got = np.asarray(_scores_dot(jnp.asarray(a, jnp.float32),
                                     jnp.asarray(b, jnp.float32)), np.float64)
        a16 = np.asarray(jnp.asarray(a, jnp.bfloat16), np.float64)
        b16 = np.asarray(jnp.asarray(b, jnp.bfloat16), np.float64)
        trunc = a16.T @ b16
        scale = np.abs(exact).max()
        err_x3 = np.abs(got - exact).max() / scale
        err_1p = np.abs(trunc - exact).max() / scale
        assert err_x3 < 3e-5, err_x3
        assert err_1p > 10 * err_x3, (err_1p, err_x3)


class TestOnTpuDetection:
    """_on_tpu() must reflect the device ops would LOWER for, not just the
    process default backend: under jax.default_device(cpu) on a TPU-backend
    process (host-side init, bench param init) a non-interpret pallas_call
    crashes on the CPU backend — the regression that killed quality-campaign
    runs on the tunnel backend (pmsk attempt 1, 2026-08-20)."""

    def test_default_device_cpu_wins_over_tpu_backend(self, monkeypatch):
        from scrabblegan_tpu.kernels import attention as ka

        monkeypatch.setattr(ka.jax, "default_backend", lambda: "axon")
        assert ka._on_tpu()  # backend says tpu-tunnel, no default_device set
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            assert not ka._on_tpu()  # lowering target is CPU
        assert ka._on_tpu()  # context exited: back to the backend answer

    def test_cpu_backend_is_not_tpu(self):
        from scrabblegan_tpu.kernels import attention as ka

        assert not ka._on_tpu()  # test env forces the cpu platform


class TestHostSideInitWithPallasModels:
    def test_init_state_under_default_device(self):
        """Trainer.init_state builds the initial state under
        jax.default_device(cpu) with the XLA-attention twin; the state must
        carry the exact param tree the pallas models expect."""
        from scrabblegan_tpu.config import load_config
        from scrabblegan_tpu.train.state import build_models, create_train_state

        cfg = load_config(None, {"shared.batch_size": 2, "io.bucket_size": 3})
        rng = jax.random.PRNGKey(0)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            twin = create_train_state(
                cfg, rng, build_models(cfg, use_pallas_attention=False))
        ref = create_train_state(cfg, rng, build_models(cfg))
        # The WHOLE TrainState must agree (ADVICE r3): a twin divergence in
        # d/r/w params, SN power vectors, BN stats, or optimizer-state trees
        # would otherwise only surface as a runtime device_put/step failure.
        assert jax.tree.structure(twin) == jax.tree.structure(ref)
        for name in ("g_params", "d_params", "r_params", "w_params"):
            ta, tb = getattr(twin, name), getattr(ref, name)
            assert jax.tree.structure(ta) == jax.tree.structure(tb), name
            for a, b in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

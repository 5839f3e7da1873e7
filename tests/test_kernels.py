"""Pallas kernel numerics tests against the pure-XLA reference path (SURVEY.md §7:
kernels "gated behind flags with XLA fallbacks and numerics tests")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scrabblegan_tpu.kernels.attention import _xla_attention, nonlocal_attention


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


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

    def test_rows_are_convex_combinations(self):
        """softmax attention output must lie within [min(g), max(g)] per channel."""
        theta = _rand(3, (1, 256, 8))
        phi = _rand(4, (1, 64, 8))
        g = _rand(5, (1, 64, 32))
        out = np.asarray(nonlocal_attention(theta, phi, g))
        assert out.max() <= float(g.max()) + 1e-5
        assert out.min() >= float(g.min()) - 1e-5

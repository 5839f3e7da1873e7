"""bfloat16 compute-policy tests: params stay fp32, outputs/losses fp32-clean,
one full train step finite under shared.dtype=bfloat16."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # jits multi-network steps / fresh model shapes

from scrabblegan_tpu.config import Config, OptimizerConfig, ParallelConfig, SharedSpecs
from scrabblegan_tpu.train.state import build_models, create_train_state
from scrabblegan_tpu.train.step import make_train_step

B = 4


@pytest.fixture(scope="module")
def bf16_setup():
    cfg = Config(
        optimizer=OptimizerConfig(),
        shared=dataclasses.replace(SharedSpecs(), batch_size=B, dtype="bfloat16"),
        parallel=ParallelConfig(num_devices=1),
    )
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    return cfg, models, state


class TestBf16:
    def test_params_are_fp32(self, bf16_setup):
        _, _, state = bf16_setup
        for leaf in jax.tree_util.tree_leaves(state.g_params):
            assert leaf.dtype == jnp.float32

    def test_generator_output_bf16_logits_fp32(self, bf16_setup):
        _, models, state = bf16_setup
        labels = jnp.zeros((B, 2), jnp.int32)
        style = jnp.zeros((B, 32, 160, 1))
        out, _ = models.generator.apply(
            {"params": state.g_params, "batch_stats": state.g_stats},
            labels, style_imgs=style, train=True, mutable=["batch_stats"])
        assert out.dtype == jnp.bfloat16
        logit, _ = models.discriminator.apply(
            {"params": state.d_params, "batch_stats": state.d_stats},
            jnp.zeros((B, 32, 32, 1)), True, mutable=["batch_stats"])
        assert logit.dtype == jnp.float32  # heads cast up for loss stability

    def test_full_step_finite(self, bf16_setup):
        cfg, models, state = bf16_setup
        rng = np.random.default_rng(0)
        batch = {
            "real_imgs": rng.uniform(-1, 1, (B, 32, 32, 1)).astype(np.float32),
            "real_labels": rng.integers(0, 52, (B, 2)).astype(np.int32),
            "style_imgs": rng.uniform(-1, 1, (B, 32, 160, 1)).astype(np.float32),
            "fake_labels": rng.integers(0, 52, (B, 2)).astype(np.int32),
        }
        step = jax.jit(make_train_step(cfg, models))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # params remain fp32 after the update
        for leaf in jax.tree_util.tree_leaves(new_state.g_params):
            assert leaf.dtype == jnp.float32

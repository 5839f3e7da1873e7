"""Optimizer construction tests (no model compiles): schedules, rmsprop swap."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scrabblegan_tpu.config import Config, OptimizerConfig
from scrabblegan_tpu.train.state import make_optimizers


def _apply_n(opt, n, lr_probe_grad=1.0):
    params = {"w": jnp.zeros(())}
    state = opt.init(params)
    updates_seen = []
    for _ in range(n):
        upd, state = opt.update({"w": jnp.asarray(lr_probe_grad)}, state, params)
        params = optax.apply_updates(params, upd)
        updates_seen.append(float(upd["w"]))
    return updates_seen


class TestOptimizers:
    def test_constant_reference_parity(self):
        opts = make_optimizers(Config())
        # Adam with constant grads: |update| == lr after bias correction
        ups = _apply_n(opts["g"], 3)
        np.testing.assert_allclose([abs(u) for u in ups], [2e-4] * 3, rtol=1e-4)

    def test_rmsprop_for_recognizer(self):
        cfg = Config(optimizer=OptimizerConfig(rmsprop=True))
        opts = make_optimizers(cfg)
        ups_r = _apply_n(opts["r"], 1)
        ups_g = _apply_n(opts["g"], 1)
        assert not np.isclose(ups_r[0], ups_g[0])  # different optimizers

    def test_cosine_schedule_decays(self):
        cfg = Config(optimizer=OptimizerConfig(lr_schedule="cosine",
                                               decay_steps=10))
        opts = make_optimizers(cfg)
        ups = _apply_n(opts["d"], 10)
        assert abs(ups[0]) > abs(ups[-1])  # lr decayed

    def test_warmup_starts_small(self):
        cfg = Config(optimizer=OptimizerConfig(lr_schedule="warmup_cosine",
                                               warmup_steps=5, decay_steps=20))
        opts = make_optimizers(cfg)
        ups = _apply_n(opts["g"], 6)
        assert abs(ups[0]) < abs(ups[4])  # ramping up

    def test_unknown_schedule(self):
        cfg = Config(optimizer=OptimizerConfig(lr_schedule="nope"))
        with pytest.raises(ValueError):
            make_optimizers(cfg)

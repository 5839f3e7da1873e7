#!/usr/bin/env python
"""Benchmark: generator inference throughput on one chip (BASELINE.json north-star
metric: word-images/sec/chip, target >= 5000 for 32px words on TPU v5e).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
All other output goes to stderr.

Config mirrors BASELINE.json config 1: big_ac_gan generator, fixed-length 5-char
words, sampled-z path, inference mode, bfloat16 compute (params fp32).

Measurement methodology: the K timed forward passes run inside ONE jitted
lax.scan whose carry depends on each iteration's output, so the device cannot
elide, overlap-hide, or lazily defer any of them — robust even on experimental
PJRT backends where block_until_ready on a leaf future is not a full sync.
Params are initialized on the host CPU backend and transferred, avoiding a
multi-minute remote compile of the init graph.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

BASELINE_IMAGES_PER_SEC = 5000.0  # BASELINE.json north_star target


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    # allow CPU alongside the TPU backend for cheap param init
    if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
        os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"

    import jax
    import jax.numpy as jnp

    from scrabblegan_tpu.config import Config, SharedSpecs
    from scrabblegan_tpu.train.state import build_models
    from scrabblegan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    batch, length = 1024, 5
    cfg = Config(shared=dataclasses.replace(
        SharedSpecs(), batch_size=batch, z_source="noise", dtype="bfloat16"))
    # Pallas fused attention: ~2x the XLA path at inference (27k vs 14-19k img/s
    # measured on v5e) and avoids materializing the (Q,K) attention matrix in HBM
    generator = build_models(cfg, use_pallas_attention=True).generator

    tpu_dev = jax.devices()[0]
    cpu_dev = jax.devices("cpu")[0]
    log(f"device: {tpu_dev}")

    labels = jnp.zeros((batch, length), jnp.int32)
    t0 = time.time()
    from scrabblegan_tpu.utils.fakeparams import fake_variables

    with jax.default_device(cpu_dev):
        z0 = jax.random.normal(jax.random.PRNGKey(0), (batch, cfg.shared.latent_dim))
        # throughput bench: param VALUES are irrelevant — build the tree from
        # eval_shape with numerically-sane fakes (orthogonal QRs would dominate)
        shapes = jax.eval_shape(
            lambda: generator.init(jax.random.PRNGKey(0), labels, z=z0, train=False))
        variables = fake_variables(shapes)
    log(f"init (host, eval_shape): {time.time() - t0:.1f}s")

    t0 = time.time()
    variables = jax.device_put(variables, tpu_dev)
    labels = jax.device_put(labels, tpu_dev)
    z0 = jax.device_put(z0, tpu_dev)
    jax.block_until_ready(variables)
    log(f"transfer: {time.time() - t0:.1f}s")

    iters = 50

    @jax.jit
    def timed_chain(variables, labels, z):
        def body(carry_z, _):
            out = generator.apply(variables, labels, z=carry_z, train=False)
            # dependency: fold a negligible function of the output back into z
            carry_z = carry_z + jnp.mean(out).astype(carry_z.dtype) * 1e-8
            return carry_z, out[0, 0, 0, 0]
        final_z, probes = jax.lax.scan(body, z, None, length=iters)
        return final_z, probes

    t0 = time.time()
    fz, probes = timed_chain(variables, labels, z0)
    _ = float(fz[0, 0]), float(probes[-1])  # device->host fetch = hard sync
    log(f"compile+first chain: {time.time() - t0:.1f}s")

    best = None
    for rep in range(3):
        t0 = time.time()
        fz, probes = timed_chain(variables, labels, z0)
        _ = float(fz[0, 0]), float(probes[-1])
        dt = time.time() - t0
        log(f"rep {rep}: {iters} fwd in {dt:.3f}s -> {batch * iters / dt:,.0f} img/s")
        best = dt if best is None else min(best, dt)

    images_per_sec = batch * iters / best

    steps_per_sec = _bench_train_step(jax, jnp, tpu_dev, cpu_dev, log)

    print(json.dumps({
        "metric": "word_images_per_sec_per_chip",
        "value": round(images_per_sec, 1),
        "unit": "images/s",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
        "extra": {"train_steps_per_sec_batch16": round(steps_per_sec, 2)},
    }))


def _bench_train_step(jax, jnp, tpu_dev, cpu_dev, log) -> float:
    """Secondary metric: full 4-network train-step rate at the reference schedule
    (batch 16 — scrabble_gan.gin:18). The timed loop chains state through donated
    buffers, so each step depends on the previous one (no pipelining illusion)."""
    import numpy as np

    from scrabblegan_tpu.config import Config, SharedSpecs
    from scrabblegan_tpu.train.state import build_models, create_train_state
    from scrabblegan_tpu.train.step import make_train_step

    cfg = Config(shared=dataclasses.replace(SharedSpecs(), batch_size=16))
    models = build_models(cfg)
    b, length = 16, 5
    from scrabblegan_tpu.utils.fakeparams import fake_variables

    with jax.default_device(cpu_dev):
        shapes = jax.eval_shape(
            lambda: create_train_state(cfg, jax.random.PRNGKey(0), models))
    state = jax.device_put(fake_variables(shapes), tpu_dev)
    rng = np.random.default_rng(0)
    batch = jax.device_put({
        "real_imgs": rng.uniform(-1, 1, (b, 32, 16 * length, 1)).astype(np.float32),
        "real_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
        "style_imgs": rng.uniform(-1, 1, (b, 32, 160, 1)).astype(np.float32),
        "fake_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
    }, tpu_dev)

    step = jax.jit(make_train_step(cfg, models), donate_argnums=(0,))
    t0 = time.time()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    _ = float(m["d_loss"])
    log(f"train step compile+first: {time.time() - t0:.1f}s")
    n = 30
    t0 = time.time()
    for i in range(n):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    _ = float(m["d_loss"])  # the last step depends on every previous state
    dt = time.time() - t0
    log(f"{n} train steps in {dt:.3f}s -> {n / dt:.2f} steps/s (batch 16)")
    return n / dt


if __name__ == "__main__":
    main()

"""On-chip A/B of the optimizer-update tail (VERDICT r2 item 6).

The train step's ~6 ms non-network tail is Adam's HBM traffic (134M params x
28 B/param = 3.75 GB/step = 4.6 ms at v5e's 819 GB/s — docs/PARITY.md
attribution, train/optim.py analysis). Variants, raw device step rate at the
reference schedule (batch 16, len 5):

  optax      stock optax.adam (28 B/param)           — the shipping default
  lean       train/optim lean_adam f32 (20 B/param)  — mu elided at b1=0
  lean_bf16  lean + bf16 second moment (16 B/param)
  sgd_floor  p -= lr*g probe (12 B/param)            — the network+param-I/O
             floor: how fast the step CAN go with a zero-state optimizer;
             NOT a shipping config, just the attribution anchor.

Prints one dict line on stdout. Usage:
  python scripts/adam_tail_ab.py [--len 5] [--iters 30] [--variants a,b,...]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"

import numpy as np
import jax
import optax

from scrabblegan_tpu.config import Config, OptimizerConfig, SharedSpecs
from scrabblegan_tpu.train import state as state_lib
from scrabblegan_tpu.train import step as step_lib
from scrabblegan_tpu.utils.cache import enable_compilation_cache
from scrabblegan_tpu.utils.fakeparams import fake_variables


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VARIANTS = {
    "optax": {},
    "lean": {"adam_impl": "lean"},
    "lean_bf16": {"adam_impl": "lean", "moment_dtype": "bfloat16"},
    "sgd_floor": {},  # special-cased below
}


def bench_variant(name, length, b, n, tpu_dev, cpu_dev):
    opt_kwargs = {k: v for k, v in VARIANTS[name].items()}
    cfg = Config(optimizer=OptimizerConfig(**opt_kwargs),
                 shared=dataclasses.replace(SharedSpecs(), batch_size=b))
    models = state_lib.build_models(cfg)

    orig = state_lib.make_optimizers
    if name == "sgd_floor":
        # floor probe: a zero-state update (no moments at all). Patch the
        # factory both where it lives and where the step imported it.
        sgd = lambda _cfg: {k: optax.sgd(2e-4) for k in ("g", "d", "r", "w")}
        state_lib.make_optimizers = sgd
        step_lib.make_optimizers = sgd
    try:
        with jax.default_device(cpu_dev):
            shapes = jax.eval_shape(lambda: state_lib.create_train_state(
                cfg, jax.random.PRNGKey(0), models))
        state = jax.device_put(fake_variables(shapes), tpu_dev)
        rng = np.random.default_rng(0)
        np_batch = {
            "real_imgs": rng.uniform(-1, 1, (b, 32, 16 * length, 1)).astype(np.float32),
            "real_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
            "style_imgs": rng.uniform(-1, 1, (b, 32, 160, 1)).astype(np.float32),
            "fake_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
        }
        batch = jax.device_put(np_batch, tpu_dev)
        step = jax.jit(step_lib.make_train_step(cfg, models),
                       donate_argnums=(0,))
        t0 = time.time()
        state, m = step(state, batch, jax.random.PRNGKey(1))
        _ = float(m["d_loss"])
        log(f"[{name}] compile+first: {time.time() - t0:.1f}s")
        best = None
        for _rep in range(3):
            t0 = time.time()
            for i in range(n):
                state, m = step(state, batch, jax.random.PRNGKey(i))
            _ = float(m["d_loss"])  # chained through donated state = hard dep
            best = min(best or 1e9, time.time() - t0)
        rate = n / best
        log(f"[{name}] {rate:.2f} steps/s ({best / n * 1e3:.2f} ms/step)")
        return rate
    finally:
        state_lib.make_optimizers = orig
        step_lib.make_optimizers = orig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--len", dest="length", type=int, default=5)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--variants", default="optax,lean,lean_bf16,sgd_floor")
    args = p.parse_args()
    enable_compilation_cache()
    tpu_dev = jax.devices()[0]
    cpu_dev = jax.devices("cpu")[0]
    log(f"device: {tpu_dev}")
    out = {"len": args.length, "batch": args.batch}
    for name in args.variants.split(","):
        out[name] = round(bench_variant(name, args.length, args.batch,
                                        args.iters, tpu_dev, cpu_dev), 2)
        if "optax" in out and name != "optax":
            ms = 1e3 / out[name] - 1e3 / out["optax"]
            log(f"[{name}] vs optax: {ms:+.2f} ms/step")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

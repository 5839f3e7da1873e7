"""Train-step batch-size scaling on the real chip: steps/s and images/s at
batch 16 (the reference schedule) up to 256 — the "is the chip saturated"
curve behind PARITY.md's MFU table. The reference trains eagerly at batch 16
(scrabble_gan.gin:18); a production deployment would raise it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/batch_scaling.py
"""
import dataclasses, os, sys, time
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import numpy as np
import jax
from scrabblegan_tpu.config import Config, SharedSpecs
from scrabblegan_tpu.train.state import build_models, create_train_state
from scrabblegan_tpu.train.step import make_train_step
from scrabblegan_tpu.utils.cache import enable_compilation_cache
from scrabblegan_tpu.utils.fakeparams import fake_variables

enable_compilation_cache()
tpu_dev = jax.devices()[0]
cpu_dev = jax.devices("cpu")[0]
length = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def measure(b):
    cfg = Config(shared=dataclasses.replace(SharedSpecs(), batch_size=b))
    models = build_models(cfg)
    with jax.default_device(cpu_dev):
        shapes = jax.eval_shape(
            lambda: create_train_state(cfg, jax.random.PRNGKey(0), models))
    state = jax.device_put(fake_variables(shapes), tpu_dev)
    rng = np.random.default_rng(0)
    np_batch = {
        "real_imgs": rng.uniform(-1, 1, (b, 32, 16 * length, 1)).astype(np.float32),
        "real_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
        "style_imgs": rng.uniform(-1, 1, (b, 32, 160, 1)).astype(np.float32),
        "fake_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
    }
    batch = jax.device_put(np_batch, tpu_dev)
    step = jax.jit(make_train_step(cfg, models), donate_argnums=(0,))
    t0 = time.time()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    _ = float(m["d_loss"])
    print(f"b{b}: compile+first {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    n = 30
    best = 1e9
    for _rep in range(3):
        t0 = time.time()
        for i in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        _ = float(m["d_loss"])
        best = min(best, time.time() - t0)
    sps = n / best
    print(f"b{b} len{length}: {sps:.2f} steps/s = {sps*b:,.0f} train img/s",
          flush=True)
    return sps


if __name__ == "__main__":
    out = {}
    for b in (16, 64, 256):
        out[b] = measure(b)
    print({b: round(s, 2) for b, s in out.items()})

"""Full train-step A/B on the real chip: f32 baseline vs trunk_dtype=bfloat16
(BN-free trunks D/W/StyleEncoder in bf16 — config.SharedSpecs.trunk_dtype).

Bench-identical methodology: the Trainer's config path, batch 16, donated
python-loop, best-of-3 windows. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/step_ab.py [len] [arms]
arms: comma list of '' (f32) / 'bf16' trunk values; default 'f32,bf16'.
"""
import os, sys, time

if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import numpy as np
import jax

from scrabblegan_tpu.config import load_config
from scrabblegan_tpu.train.state import build_models, create_train_state
from scrabblegan_tpu.train.step import make_train_step
from scrabblegan_tpu.utils.cache import enable_compilation_cache
from scrabblegan_tpu.utils.fakeparams import fake_variables


def log(*a):
    print(*a, file=sys.stderr, flush=True)


enable_compilation_cache()
tpu_dev = jax.devices()[0]
cpu_dev = jax.devices("cpu")[0]
length = int(sys.argv[1]) if len(sys.argv) > 1 else 5
arms = (sys.argv[2] if len(sys.argv) > 2 else "f32,bf16").split(",")
b, n = 16, 30
rng = np.random.default_rng(0)
np_batch = {
    "real_imgs": rng.integers(0, 256, (b, 32, 16 * length, 1)).astype(np.uint8),
    "real_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
    "style_imgs": rng.integers(0, 256, (b, 32, 160, 1)).astype(np.uint8),
    "fake_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
}
batch = jax.device_put(np_batch, tpu_dev)
with jax.default_device(cpu_dev):
    keys = [jax.random.PRNGKey(i) for i in range(n + 1)]
keys = jax.device_put(keys, tpu_dev)

RESULTS = {}
for arm in arms:
    trunk = "bfloat16" if arm == "bf16" else ""
    cfg = load_config(None, {"shared.batch_size": 16, "io.seq_len": length,
                             "shared.num_gen": 4,
                             "shared.trunk_dtype": trunk})
    models = build_models(cfg)
    with jax.default_device(cpu_dev):
        shapes = jax.eval_shape(
            lambda: create_train_state(cfg, jax.random.PRNGKey(0), models))
    state = jax.device_put(fake_variables(shapes), tpu_dev)
    step = jax.jit(make_train_step(cfg, models), donate_argnums=(0,))
    t0 = time.time()
    state, m = step(state, batch, keys[n])
    _ = float(m["d_loss"])
    log(f"{arm or 'f32'}: compile {time.time() - t0:.1f}s")
    best = 1e9
    for _rep in range(3):
        t0 = time.time()
        for i in range(n):
            state, m = step(state, batch, keys[i])
        _ = float(m["d_loss"])
        best = min(best, (time.time() - t0) / n)
    RESULTS[arm or "f32"] = round(best * 1e3, 3)
    log(f"{arm or 'f32'}: {best * 1e3:.2f} ms/step -> {1 / best:.2f} steps/s")

import json

print(json.dumps({"length": length, **RESULTS}))

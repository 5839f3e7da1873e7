"""Capture a jax.profiler trace + compiled HLO of the full 4-network train
step on the real TPU chip (f32, batch 16, default bucketed mode). Trace ->
/tmp/train_trace, HLO -> /tmp/train_hlo.txt.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train.py [len]
"""
import dataclasses, os, sys
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
length = int(sys.argv[1]) if len(sys.argv) > 1 else 10
cfg = Config(shared=dataclasses.replace(SharedSpecs(), batch_size=16))
models = build_models(cfg)
b = 16
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
state, m = step(state, batch, jax.random.PRNGKey(1))
_ = float(m["d_loss"])
import shutil; shutil.rmtree('/tmp/train_trace', ignore_errors=True)
with jax.profiler.trace("/tmp/train_trace"):
    for i in range(10):
        state, m = step(state, batch, jax.random.PRNGKey(2 + i))
    _ = float(m["d_loss"])
try:
    txt = step.lower(state, batch, jax.random.PRNGKey(9)).compile().as_text()
    open('/tmp/train_hlo.txt', 'w').write(txt)
except Exception as e:
    print('hlo dump failed:', e)
print("done")

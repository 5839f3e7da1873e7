"""Quick A/B microbenchmark on the real TPU chip: generator inference img/s at
len 5/10 (bf16, fake params) and raw train steps/s at len 5/10.

Lighter than bench.py (no MFU accounting, no e2e Trainer window) — meant for
iterating on kernel/layout changes. Prints one dict line on stdout."""
import dataclasses, os, sys, time
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import numpy as np
import jax, jax.numpy as jnp
from scrabblegan_tpu.config import Config, SharedSpecs
from scrabblegan_tpu.train.state import build_models, create_train_state
from scrabblegan_tpu.train.step import make_train_step
from scrabblegan_tpu.utils.cache import enable_compilation_cache
from scrabblegan_tpu.utils.fakeparams import fake_variables
def log(*a): print(*a, file=sys.stderr, flush=True)
enable_compilation_cache()
tpu_dev = jax.devices()[0]; cpu_dev = jax.devices("cpu")[0]
def bench_inf(length, iters=50, batch=1024):
    cfg = Config(shared=dataclasses.replace(
        SharedSpecs(), batch_size=batch, z_source="noise", dtype="bfloat16"))
    gen = build_models(cfg, use_pallas_attention=True).generator
    labels = jnp.zeros((batch, length), jnp.int32)
    with jax.default_device(cpu_dev):
        z0 = jax.random.normal(jax.random.PRNGKey(0), (batch, cfg.shared.latent_dim))
        shapes = jax.eval_shape(lambda: gen.init(jax.random.PRNGKey(0), labels, z=z0, train=False))
        variables = fake_variables(shapes)
    variables = jax.device_put(variables, tpu_dev)
    labels_d = jax.device_put(labels, tpu_dev); z0 = jax.device_put(z0, tpu_dev)
    jax.block_until_ready(variables)
    @jax.jit
    def timed_chain(variables, labels, z):
        def body(carry_z, _):
            out = gen.apply(variables, labels, z=carry_z, train=False)
            return carry_z + jnp.mean(out).astype(carry_z.dtype) * 1e-8, out[0, 0, 0, 0]
        return jax.lax.scan(body, z, None, length=iters)
    t0 = time.time()
    fz, probes = timed_chain(variables, labels_d, z0)
    _ = float(fz[0, 0]), float(probes[-1])
    log(f"[len{length}] compile+first: {time.time()-t0:.1f}s")
    best = None
    for rep in range(3):
        t0 = time.time()
        fz, probes = timed_chain(variables, labels_d, z0)
        _ = float(fz[0, 0]), float(probes[-1])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    rate = batch * iters / best
    log(f"[len{length}] {rate:,.0f} img/s")
    return rate
def bench_step(length=5, b=16, n=30):
    cfg = Config(shared=dataclasses.replace(SharedSpecs(), batch_size=b))
    models = build_models(cfg)
    with jax.default_device(cpu_dev):
        shapes = jax.eval_shape(lambda: create_train_state(cfg, jax.random.PRNGKey(0), models))
    state = jax.device_put(fake_variables(shapes), tpu_dev)
    rng = np.random.default_rng(0)
    np_batch = {
        "real_imgs": rng.uniform(-1, 1, (b, 32, 16*length, 1)).astype(np.float32),
        "real_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
        "style_imgs": rng.uniform(-1, 1, (b, 32, 160, 1)).astype(np.float32),
        "fake_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
    }
    batch = jax.device_put(np_batch, tpu_dev)
    step = jax.jit(make_train_step(cfg, models), donate_argnums=(0,))
    t0 = time.time()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    _ = float(m["d_loss"])
    log(f"[step len{length}] compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    for i in range(n):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    _ = float(m["d_loss"])
    dt = time.time() - t0
    log(f"[step len{length}] {n/dt:.2f} steps/s")
    return n / dt
r5 = bench_inf(5); r10 = bench_inf(10, iters=30)
s5 = bench_step(5); s10 = bench_step(10)
print({"inf5": round(r5), "inf10": round(r10), "step5": round(s5,2), "step10": round(s10,2)})

"""G-internal attribution + BN-free-trunk bf16 A/B at len-5 batch-16.

Times (scan-chained, fake params):
  g_fwd_style / g_fwd_noise      forward only, style vs noise z path
  g_fb_style  / g_fb_noise       fwd+bwd (the in-step G cost) per z path
  se_fb                          StyleEncoder alone fwd+bwd
  d2_f32 / d2_bf16               D 2-pass fwd+bwd, f32 vs bf16 trunk
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/g_probe.py
"""
import dataclasses, os, sys, time

if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import numpy as np
import jax
import jax.numpy as jnp

from scrabblegan_tpu.config import load_config
from scrabblegan_tpu.models.discriminator import Discriminator
from scrabblegan_tpu.models.generator import Generator, StyleEncoder
from scrabblegan_tpu.utils.cache import enable_compilation_cache
from scrabblegan_tpu.utils.fakeparams import fake_variables


def log(*a):
    print(*a, file=sys.stderr, flush=True)


enable_compilation_cache()
tpu_dev = jax.devices()[0]
cpu_dev = jax.devices("cpu")[0]
length, b = 5, 16
cfg = load_config(None, {"shared.batch_size": 16, "io.seq_len": length})
rng = np.random.default_rng(0)
labels = jax.device_put(
    rng.integers(0, 52, (b, length)).astype(np.int32), tpu_dev)
style = jax.device_put(
    rng.uniform(-1, 1, (b, 32, 160, 1)).astype(np.float32), tpu_dev)
imgs = jax.device_put(
    rng.uniform(-1, 1, (b, 32, 16 * length, 1)).astype(np.float32), tpu_dev)
z = jax.device_put(rng.standard_normal((b, 128)).astype(np.float32), tpu_dev)

RESULTS = {}


def timeit(name, fn, iters=50):
    t0 = time.time()
    out = fn()
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    log(f"{name}: compile {time.time() - t0:.1f}s")
    best = 1e9
    for _rep in range(3):
        t0 = time.time()
        out = fn()
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.time() - t0) / iters)
    RESULTS[name] = round(best * 1e3, 3)
    log(f"{name}: {best * 1e3:.3f} ms/iter")


def chained(body, carry0, iters=50):
    @jax.jit
    def run(carry):
        def f(c, _):
            return body(c), None
        c, _ = jax.lax.scan(f, carry, None, length=iters)
        return c
    return lambda: run(carry0)


def init_vars(model, *args, **kw):
    with jax.default_device(cpu_dev):
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), *args, **kw))
        v = fake_variables(shapes)
    return jax.device_put(v, tpu_dev)


def gen_model(z_source, dtype=jnp.float32):
    return Generator(vocab_size=52, z_source=z_source, use_sn=True,
                     use_pallas_attention=True, num_pad_tokens=0, dtype=dtype)


# ---- G forward / fwd+bwd, style vs noise path ----
for src, cond in (("style", style), ("noise", z)):
    G = gen_model(src)
    kw = {"style_imgs": cond} if src == "style" else {"z": cond}
    gv = init_vars(G, labels, train=True, **kw)

    def fwd_body(c, gv=gv, G=G, kw=kw):
        out, _ = G.apply(gv, labels, train=True, mutable=["batch_stats"], **kw)
        return c + jnp.mean(out)

    timeit(f"g_fwd_{src}", chained(fwd_body, jnp.float32(0)))

    def fb_body(carry, gv=gv, G=G, kw=kw):
        p = carry

        def loss(params):
            out, _ = G.apply({"params": params,
                              "batch_stats": gv["batch_stats"]},
                             labels, train=True, mutable=["batch_stats"], **kw)
            return jnp.sum(out * 1e-6)

        g = jax.grad(loss)(p)
        return jax.tree.map(lambda a, b_: a - 0.0 * b_, p, g)

    timeit(f"g_fb_{src}", chained(fb_body, gv["params"], iters=30), iters=30)

# ---- StyleEncoder alone fwd+bwd ----
SE = StyleEncoder(dtype=jnp.float32)
sev = init_vars(SE, style, train=True)


def se_body(p):
    def loss(params):
        out, _ = SE.apply({"params": params, "batch_stats": sev["batch_stats"]},
                          style, train=True, mutable=["batch_stats"])
        return jnp.sum(out)

    g = jax.grad(loss)(p)
    return jax.tree.map(lambda a, b_: a - 0.0 * b_, p, g)


timeit("se_fb", chained(se_body, sev["params"], iters=30), iters=30)

# ---- D 2-pass, f32 vs bf16 trunk ----
for tag, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    D = Discriminator(use_sn=True, use_pallas_attention=True, dtype=dt)
    dv = init_vars(D, imgs, True)

    def d_body(p, D=D, dv=dv):
        def loss(params):
            v = {"params": params, "batch_stats": dv["batch_stats"]}
            a, _ = D.apply(v, imgs, True, mutable=["batch_stats"])
            c, _ = D.apply(v, imgs * 0.5, True, mutable=["batch_stats"])
            return jnp.sum(a) + jnp.sum(c)

        g = jax.grad(loss)(p)
        return jax.tree.map(lambda a, b_: a - 0.0 * b_, p, g)

    timeit(f"d2_{tag}", chained(d_body, dv["params"], iters=30), iters=30)

import json

print(json.dumps({"length": length, "batch": b, **RESULTS}))

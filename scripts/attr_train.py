"""Per-network device-time attribution of the train step at a given length.

Times, each as its own jitted scan-chain on the real chip (fake params,
batch 16, the bench's exact Trainer config):
  - full train step            (python-loop AND scan-chain variants — the
                                delta is per-dispatch tunnel overhead)
  - G fwd+bwd (own loss)       - D 2-pass fwd+bwd   - W 3-pass fwd+bwd
  - R 2-pass fwd+bwd (CTC)     - optimizer tail (4x lean-adam on zeros)
Numbers do not exactly sum to the step (cross-network fusion, CSE), but rank
the hot spots. Usage: python scripts/attr_train.py [len]
"""
import dataclasses, os, sys, time

if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"
import numpy as np
import jax
import jax.numpy as jnp

from scrabblegan_tpu.config import load_config
from scrabblegan_tpu.train.state import build_models, create_train_state, make_optimizers
from scrabblegan_tpu.train.step import make_train_step
from scrabblegan_tpu.utils.cache import enable_compilation_cache
from scrabblegan_tpu.utils.fakeparams import fake_variables


def log(*a):
    print(*a, file=sys.stderr, flush=True)


enable_compilation_cache()
tpu_dev = jax.devices()[0]
cpu_dev = jax.devices("cpu")[0]
length = int(sys.argv[1]) if len(sys.argv) > 1 else 5
b = 16
cfg = load_config(None, {"shared.batch_size": 16, "io.seq_len": length,
                         "shared.num_gen": 4})
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
G, D, R, W = (models.generator, models.discriminator, models.recognizer,
              models.style_promoter)

RESULTS = {}


def timeit(name, fn, *args, iters=30):
    """fn must return a scalar-fetchable probe; scan-chains internally."""
    t0 = time.time()
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    log(f"{name}: compile {time.time() - t0:.1f}s")
    best = 1e9
    for _rep in range(3):
        t0 = time.time()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, (time.time() - t0) / iters)
    RESULTS[name] = best * 1e3
    log(f"{name}: {best * 1e3:.2f} ms/iter")
    return best


def chain(body, iters=30):
    @jax.jit
    def run(carry, batch):
        def f(c, _):
            return body(c, batch), None
        c, _ = jax.lax.scan(f, carry, None, length=iters)
        return c
    return run


# ---- full step: python loop (dispatch-per-step, like bench raw) ----
step = jax.jit(make_train_step(cfg, models), donate_argnums=(0,))
n = 30
# pre-build all rng keys on the host and ship once: a PRNGKey() inside the
# timed loop is a tiny TPU dispatch per iteration over the tunnel (and one
# transient tunnel fault there kills the whole run)
with jax.default_device(cpu_dev):
    keys = [jax.random.PRNGKey(i) for i in range(n + 1)]
keys = jax.device_put(keys, tpu_dev)
t0 = time.time()
state2, m = step(state, batch, keys[n])
_ = float(m["d_loss"])
log(f"step: compile {time.time() - t0:.1f}s")
best = 1e9
st = state2  # donated buffers: never reuse a state after passing it in
for _rep in range(3):
    t0 = time.time()
    for i in range(n):
        st, m = step(st, batch, keys[i])
    _ = float(m["d_loss"])
    best = min(best, (time.time() - t0) / n)
RESULTS["step_loop"] = best * 1e3
log(f"step_loop: {best * 1e3:.2f} ms/step -> {1 / best:.2f} steps/s")
state = st  # keep a live (non-donated) state reference

# ---- full step: device-resident scan chain (pure device rate) ----
raw_step = make_train_step(cfg, models)


def step_body(carry, batch):
    st, key = carry
    key, sub = jax.random.split(key)
    st, m = raw_step(st, batch, sub)
    return (st, key)


run = chain(step_body)
timeit("step_scan", lambda: run((state, jax.random.PRNGKey(0)), batch))

# ---- per-network fwd+bwd probes ----
opts = make_optimizers(cfg)


def g_only(carry, batch):
    st, key = carry
    key, sub, drop = jax.random.split(key, 3)
    z = jax.random.normal(sub, (b, cfg.shared.latent_dim))

    def loss(gp):
        kw = {"style_imgs": batch["style_imgs"]} \
            if cfg.shared.z_source == "style" else {"z": z}
        imgs, _ = G.apply({"params": gp, "batch_stats": st.g_stats},
                          batch["fake_labels"], train=True,
                          mutable=["batch_stats"], **kw)
        return jnp.sum(imgs * 1e-6)

    grads = jax.grad(loss)(st.g_params)
    st = st.replace(g_params=jax.tree.map(
        lambda p, g: p - 0.0 * g, st.g_params, grads))
    return (st, key)


def d_only(carry, batch):
    st, key = carry

    def loss(dp):
        v = {"params": dp, "batch_stats": st.d_stats}
        a, _ = D.apply(v, batch["real_imgs"], True, mutable=["batch_stats"])
        bq, _ = D.apply(v, batch["style_imgs"][:, :, :16 * length, :], True,
                        mutable=["batch_stats"])
        return jnp.sum(a) + jnp.sum(bq)

    grads = jax.grad(loss)(st.d_params)
    st = st.replace(d_params=jax.tree.map(
        lambda p, g: p - 0.0 * g, st.d_params, grads))
    return (st, key)


def w_only(carry, batch):
    st, key = carry

    def loss(wp):
        v = {"params": wp, "batch_stats": st.w_stats}
        a, _ = W.apply(v, batch["style_imgs"], True, mutable=["batch_stats"])
        bq, _ = W.apply(v, batch["real_imgs"], True, mutable=["batch_stats"])
        c, _ = W.apply(v, batch["real_imgs"] * 0.5, True,
                       mutable=["batch_stats"])
        return jnp.sum(a) + jnp.sum(bq) + jnp.sum(c)

    grads = jax.grad(loss)(st.w_params)
    st = st.replace(w_params=jax.tree.map(
        lambda p, g: p - 0.0 * g, st.w_params, grads))
    return (st, key)


def r_only(carry, batch):
    st, key = carry
    key, drop = jax.random.split(key)
    from scrabblegan_tpu.ops.ctc import ctc_loss
    lens = jnp.full((b,), length, jnp.int32)

    def loss(rp):
        v = {"params": rp, "batch_stats": st.r_stats}
        l1, _ = R.apply(v, batch["real_imgs"], True, mutable=["batch_stats"],
                        rngs={"dropout": drop})
        l2, _ = R.apply(v, batch["real_imgs"] * 0.5, True,
                        mutable=["batch_stats"], rngs={"dropout": drop})
        return (jnp.mean(ctc_loss(l1, batch["real_labels"], 4 * lens - 1, lens))
                + jnp.mean(ctc_loss(l2, batch["real_labels"], 4 * lens - 1,
                                    lens)))

    grads = jax.grad(loss)(st.r_params)
    st = st.replace(r_params=jax.tree.map(
        lambda p, g: p - 0.0 * g, st.r_params, grads))
    return (st, key)


def opt_only(carry, batch):
    st, key = carry
    for net, params, opt_state in (("g", st.g_params, st.g_opt),
                                   ("d", st.d_params, st.d_opt),
                                   ("r", st.r_params, st.r_opt),
                                   ("w", st.w_params, st.w_opt)):
        grads = jax.tree.map(lambda p: p * 1e-8, params)
        upd, new_opt = opts[net].update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        st = st.replace(**{f"{net}_params": params, f"{net}_opt": new_opt})
    return (st, key)


for name, body in (("g_fwdbwd", g_only), ("d_2pass", d_only),
                   ("w_3pass", w_only), ("r_2pass", r_only),
                   ("opt_tail", opt_only)):
    run = chain(body)
    timeit(name, lambda run=run: run((state, jax.random.PRNGKey(0)), batch))

import json

print(json.dumps({"length": length, "batch": b,
                  **{k: round(v, 3) for k, v in RESULTS.items()}}))

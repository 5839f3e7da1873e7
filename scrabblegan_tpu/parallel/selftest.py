"""Data-parallel parity selftest: mesh=N numerics must match mesh=1 (SURVEY.md §5
parity criterion for the new parallelism component).

Runs as `python -m scrabblegan_tpu.parallel.selftest [n_devices]` and prints
'PARITY-OK' on success. Kept subprocess-runnable because XLA:CPU's multi-replica
rendezvous can hard-abort the host process under load (a CHECK failure, not a
Python exception) — the test suite invokes this in a child process so an abort
fails one test instead of killing the run.
"""

from __future__ import annotations

import dataclasses
import os
import sys


def run(n_devices: int = 8) -> bool:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={n_devices}"
    if "collective_call_terminate" not in flags:
        flags += (" --xla_cpu_collective_timeout_seconds=1200"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    os.environ["XLA_FLAGS"] = flags.strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scrabblegan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from scrabblegan_tpu.config import Config, OptimizerConfig, ParallelConfig, SharedSpecs
    from scrabblegan_tpu.parallel.mesh import make_mesh, make_parallel_train_step
    from scrabblegan_tpu.train.state import build_models, create_train_state
    from scrabblegan_tpu.train.step import METRIC_NAMES

    b, length = n_devices, 2
    cfg = Config(
        optimizer=OptimizerConfig(),
        shared=dataclasses.replace(SharedSpecs(), batch_size=b),
        parallel=ParallelConfig(num_devices=1),
    )
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    rng = np.random.default_rng(0)
    batch = {
        "real_imgs": rng.uniform(-1, 1, (b, 32, 16 * length, 1)).astype(np.float32),
        "real_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
        "style_imgs": rng.uniform(-1, 1, (b, 32, 160, 1)).astype(np.float32),
        "fake_labels": rng.integers(0, 52, (b, length)).astype(np.int32),
    }
    rngk = jax.random.PRNGKey(2)

    step1 = make_parallel_train_step(cfg, models, make_mesh(1), donate=False)
    s1, m1 = step1(state, batch, rngk)
    stepn = make_parallel_train_step(cfg, models, make_mesh(n_devices), donate=False)
    sn, mn = stepn(state, batch, rngk)

    ok = True
    for k in METRIC_NAMES:
        a, c = float(m1[k]), float(mn[k])
        if not np.isclose(a, c, rtol=2e-3, atol=2e-4):
            print(f"MISMATCH {k}: mesh1={a} mesh{n_devices}={c}")
            ok = False
    g1 = jax.device_get(s1.g_params)
    gn = jax.device_get(sn.g_params)
    maxd = max(float(np.abs(np.asarray(x) - np.asarray(y)).max())
               for x, y in zip(jax.tree_util.tree_leaves(g1),
                               jax.tree_util.tree_leaves(gn)))
    if maxd > 5e-3:
        print(f"PARAM MISMATCH maxdiff={maxd}")
        ok = False
    if ok:
        print("PARITY-OK")
    return ok


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sys.exit(0 if run(n) else 1)

"""Test env: run everything on CPU with 8 virtual devices so pjit/shard_map
data-parallel paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a TPU tunnel
# (e.g. 'axon') AND import jax at interpreter startup via sitecustomize, so the
# env var alone is too late — set the config explicitly before any backend
# initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# 8 virtual replicas share the host's intra-op pool, so a replica can take
# minutes to reach its first all-reduce; the default rendezvous terminate
# timeout CHECK-aborts the whole process. Give collectives room.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=1200"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              # time-shared replica threads trip the 20s "may be stuck"
              # rendezvous warning spuriously; keep the test logs clean
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}")

# Persistent compilation cache: model inits dominate test time on CPU; cache
# compiled executables across pytest runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)

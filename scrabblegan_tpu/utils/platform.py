"""Make JAX_PLATFORMS effective even when a sitecustomize pre-imports jax.

This environment registers a TPU-tunnel PJRT plugin from sitecustomize.py at
interpreter startup and pins the platform itself; by the time user code runs,
exporting JAX_PLATFORMS=cpu on the command line is silently ignored. Entry points
call apply_env_platform() first thing so the env var regains its documented
meaning (critical for the driver's virtual-CPU dryrun and for CPU-only CLI use).
"""

from __future__ import annotations

import os


def apply_env_platform() -> str | None:
    """Force jax's platform config to match the JAX_PLATFORMS env var, if set.
    Must run before any backend initializes. Returns the applied value.

    Always keeps a 'cpu' backend available alongside the accelerator (e.g.
    'axon' -> 'axon,cpu'): the first platform stays the default device, and
    host-side param init (Trainer.init_state) + analytic FLOP tracing need the
    CPU client. No-op when the platform list already includes cpu or when no
    platform is pinned at all (auto-detection keeps cpu anyway)."""
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if not plat:
        try:  # a sitecustomize may have pinned the platform before us
            plat = jax.config.jax_platforms
        except AttributeError:
            plat = None
    if not plat:
        return None
    if "cpu" not in plat.split(","):
        plat = plat + ",cpu"
    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backends already initialized; keep whatever is live
    return plat

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
    Must run before any backend initializes. Returns the applied value."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return None
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backends already initialized; keep whatever is live
    return plat

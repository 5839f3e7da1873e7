"""Persistent XLA compilation cache.

The bucketed design compiles one train-step specialization per word-length bucket
(SURVEY.md §7 "bounded recompilation"); the persistent cache makes that a
first-run-only cost — subsequent processes (resume, re-bench, inference) load
compiled executables from disk.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SCRABBLEGAN_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "scrabblegan_tpu", "xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir

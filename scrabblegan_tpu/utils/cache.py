"""Persistent XLA compilation cache — enabled on XLA:CPU only.

The bucketed design compiles one train-step specialization per word-length
bucket (SURVEY.md §7 "bounded recompilation"); on CPU the persistent cache
makes that a first-run-only cost — subsequent processes (resume, re-bench,
pytest with tests/.jax_cache) load compiled executables from disk in seconds.

On the remote-TPU (axon) backend the cache is a measured NET LOSS and is NOT
enabled (round-5 root cause of the r3/r4 record regressions, VERDICT r4
item 2). Controlled experiment (2026-08-21, /tmp/cachetest.py methodology —
one trivial jitted matmul, jax_explain_cache_misses on):

  - cold compile, no cache:        1.9 s
  - cold compile + cache WRITE:   19.2 s   (executable serialization through
                                            the tunnel)
  - fresh process, cache HIT:    210.5 s   (disk keys matched — the keys ARE
                                            stable cross-process — but
                                            backend deserialization costs
                                            ~70 s PER EXECUTABLE)

So on this backend a persistent-cache "hit" costs 10-100x a plain cold
compile, and enabling the cache also taxes every compile with the serialize
write. The earlier "cross-process fingerprint instability" hypothesis
(STATUS.md r4) was wrong: fingerprints match; deserialization is the cost.
In-process sharing is provided instead by the step memo in
parallel/mesh.make_parallel_train_step.

Cross-HOST sharing of CPU entries is also unsafe: XLA:CPU executables embed
the compile machine's CPU features, and loading them on a different host
deserializes multi-MB AOT blobs only to warn and fall back (MULTICHIP_r03
tail). Same-host CPU reuse — the case that matters for tests and local CLI
drives — works and stays on.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compile cache when the backend profits from it
    (XLA:CPU). Returns the cache dir, or None when not enabled."""
    import jax

    if jax.default_backend() != "cpu":
        return None
    cache_dir = cache_dir or os.environ.get(
        "SCRABBLEGAN_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "scrabblegan_tpu", "xla"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir

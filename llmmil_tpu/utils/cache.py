"""Persistent XLA compile cache for the CLI entry points.

Remote (tunneled-TPU) compiles of production-size graphs take 5-30 min;
the persistent cache turns warm re-runs of the same program into sub-second
loads (BENCH_NOTES r3 "jitted init" section measured 33 s cold → 0.5 s
warm).  Library code never sets this — only the CLIs opt in, so embedding
applications keep control of their own jax config.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``path`` (default
    ``$JAX_COMPILATION_CACHE_DIR`` or ``/tmp/jax_cache``).  Returns the
    directory used."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took real compile time; tiny programs are
    # cheaper to recompile than to hash + fetch
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path

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


def compiler_options_from_cfg(cfg):
    """``Config.xla_options`` ("key=value" strings) as a jax.jit
    ``compiler_options`` dict, or None when empty.

    The options serialize through PJRT CompileOptions, so they reach the
    compiler even on the tunneled axon backend where client-side
    XLA_FLAGS never leave the host (verified: an unknown option fails the
    REMOTE compile).  They are part of jax's persistent-cache key
    (jax/_src/cache_key.py hashes compile_options), so changing them
    can't serve a stale executable.

    TPU-specific options (``xla_tpu_*``) are dropped when no TPU device
    is attached — the CPU test/dryrun backends would reject them as
    unknown flags.
    """
    opts = {}
    for kv in getattr(cfg, "xla_options", None) or []:
        k, _, v = kv.partition("=")
        if k:
            opts[k] = v
    if any(k.startswith("xla_tpu_") for k in opts):
        import jax

        try:
            on_tpu = any("tpu" in d.device_kind.lower()
                         for d in jax.devices())
        except Exception:
            on_tpu = False
        if not on_tpu:
            opts = {k: v for k, v in opts.items()
                    if not k.startswith("xla_tpu_")}
    return opts or None

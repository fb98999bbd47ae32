"""Test harness: force a virtual 8-device CPU mesh so multi-chip sharding code
paths (the TPU-slice substitute) are exercised without TPU hardware.

Note: a site hook pins JAX_PLATFORMS=axon in this environment, so the platform
must be overridden through jax.config, not the env var.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# LLMMIL_TEST_TPU=1 runs the suite on the attached TPU instead (for the
# TPU-marked goldens, e.g. tests/test_golden_bf16.py)
if not os.environ.get("LLMMIL_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache (same dir as __graft_entry__): the suite is
# compile-dominated on this 1-core host — flagship-sized test programs
# (export/int8/eval-driver tests) take minutes each to build, seconds to
# replay from cache.  The dir is keyed by the host's CPU feature
# fingerprint: /tmp persists across rounds but rounds can land on
# different machines, and XLA:CPU AOT blobs compiled for another
# machine's features load with a SIGILL warning (observed here) — a
# cross-host cache hit can crash the process mid-test.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next(line for line in _f if line.startswith("flags"))
    _tag = hashlib.md5(_flags.encode()).hexdigest()[:8]
except Exception:
    _tag = "generic"
try:
    jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{_tag}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

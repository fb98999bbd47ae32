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

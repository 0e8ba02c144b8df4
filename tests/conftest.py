"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by ``bench.py`` and the driver's compile
checks; unit/integration tests must be hermetic and multi-device capable,
so we force the CPU backend with 8 virtual devices before JAX initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gossamer_tpu  # noqa: E402,F401  (enables x64 before any test imports jax.numpy)

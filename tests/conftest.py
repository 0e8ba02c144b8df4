"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by ``bench.py`` and the driver's compile
checks; unit/integration tests must be hermetic and multi-device capable,
so we force the CPU backend with 8 virtual devices.  NOTE: the session
env presets ``JAX_PLATFORMS=axon`` and the axon plugin re-asserts it, so
the override must go through ``jax.config`` after import — the env var
alone is not honored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import gossamer_tpu  # noqa: E402,F401  (enables x64 before jax.numpy loads)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_gossamer")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

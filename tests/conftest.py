"""Test configuration: force CPU with 8 virtual devices.

Mirrors the survey's test strategy (SURVEY §4): every test runs on CPU so
CI needs no accelerator, and an 8-device virtual mesh exercises the
multi-chip sharding paths the reference could never test (it had no
fake-NCCL backend).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; the config
# update below is the reliable way to force the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/snt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

"""Test configuration: force CPU with 8 virtual devices.

Mirrors the survey's test strategy (SURVEY §4): every test runs on CPU so
CI needs no accelerator, and an 8-device virtual mesh exercises the
multi-chip sharding paths the reference could never test (it had no
fake-NCCL backend).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the test graphs are deep (grad through the
# whole pipeline) and CPU-XLA compiles are slow; cache across runs.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/snt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

"""Test configuration: run all tests on CPU with an 8-device virtual mesh.

Real-TPU benchmarking happens via bench.py; unit/e2e tests are deterministic
CPU runs so they work anywhere (mirrors the driver's dryrun environment).

Note: the environment's sitecustomize imports jax and registers the 'axon'
TPU plugin before conftest runs, so setting JAX_PLATFORMS in os.environ here
is too late — we must go through jax.config after import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

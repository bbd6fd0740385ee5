"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip logic (dp/fsdp sharding, collectives) is validated on a virtual
8-device CPU mesh, mirroring how the driver dry-runs `dryrun_multichip`.

Note: this machine's sitecustomize force-registers a remote TPU backend
(JAX_PLATFORMS=axon) in every process, so we override backend selection via
jax.config *before* first backend use — env vars alone are not enough.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# STOM tests pin LK (cheap, deterministic on CPU); the shipped
# CoTracker3 default path has its own dedicated test
# (tests/test_stom.py::test_default_tracker_shipped_weights).
os.environ.setdefault("RGA3_STOM_TRACKER", "lk")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.local_device_count() == 8, "expected 8 virtual CPU devices"

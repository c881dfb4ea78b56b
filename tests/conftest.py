"""Test harness: run everything on an 8-virtual-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

NOTE: this image pins the axon TPU backend via sitecustomize, which imports
jax and registers the plugin BEFORE env vars can win — so the env-var route
(JAX_PLATFORMS=cpu) is ignored. jax.config.update is the authoritative
switch; it must run before any backend is touched (conftest imports first).
"""

import os

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

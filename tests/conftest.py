"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware.

NOTE: the harness presets JAX_PLATFORMS=axon and an /root/.axon_site
sitecustomize that force-registers the tunneled TPU backend at interpreter
startup — setting the env var here is NOT enough; we must override via
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

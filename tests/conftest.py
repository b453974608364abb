"""Test configuration: force an 8-device CPU platform so mesh/sharding tests
run without TPU hardware.

Note: this image's sitecustomize pre-imports jax and registers the 'axon'
TPU backend with JAX_PLATFORMS=axon pinned in the env, so setting the env
var here is too late — we must override via jax.config before any backend
is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

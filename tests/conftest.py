"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

The environment registers a remote-TPU ('axon') backend from
sitecustomize at interpreter start, before conftest runs — so setting
JAX_PLATFORMS here is too late. jax.config.update works at any point
before first backend use and wins over the plugin.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

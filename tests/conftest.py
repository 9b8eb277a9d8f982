"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and forces
``jax_platforms='axon,cpu'`` through jax.config (which wins over the env
var), so we both set the env for vanilla environments and override the
config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

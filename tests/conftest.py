"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin at interpreter
startup and forces JAX_PLATFORMS=axon, so tests must both override the env
var and update jax's config before any backend initializes. Real-chip tests
opt in via the `tpu` marker and are skipped by default (run bench.py on the
chip instead).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

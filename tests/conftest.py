"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the fake-backend analog for multi-chip testing (SURVEY.md §4): real
TPU runs happen via bench.py / the CLI, while unit + sharding tests use
XLA's host-platform device emulation. Note: a site hook may pre-register a
TPU platform and override JAX_PLATFORMS, so we force the platform through
jax.config, which wins over both.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

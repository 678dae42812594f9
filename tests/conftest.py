"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize registers the TPU plugin at interpreter startup and
env-var overrides are ignored by then; `jax.config.update` is the reliable
switch. XLA_FLAGS must be set before the CPU client initializes.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()

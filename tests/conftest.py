"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment's sitecustomize registers the `axon` TPU platform and sets
the `jax_platforms` config *programmatically*, which overrides JAX_PLATFORMS
env vars — so we must force CPU via jax.config.update after import.
XLA_FLAGS still must be set before backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()

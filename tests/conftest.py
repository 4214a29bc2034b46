"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The container preloads jax with the tunneled single-TPU backend via
sitecustomize, so env vars alone don't help — jax is already imported when
pytest starts.  The backend is only *initialized* on first use, so switching
``jax_platforms`` to cpu here (before any computation) keeps the whole test
suite off the real chip, and the XLA host-device-count flag gives the 8-way
virtual mesh for sharding tests (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"

"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

This is the standard JAX single-host fake-multi-device trick
(`xla_force_host_platform_device_count`) replacing the reference's
"launch real DDP to test distribution" approach (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may pre-register a TPU plugin from sitecustomize before
# this file runs; jax.config captured JAX_PLATFORMS at import time, so
# override through the config API as well (backends init lazily).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from mage_tpu.parallel import make_mesh

    return make_mesh({"data": -1})


@pytest.fixture()
def rng():
    import jax

    return jax.random.PRNGKey(0)

"""Test config: CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the reference had no fake-backend
distributed tests at all — see SURVEY.md §4.1).

Note: this image registers an 'axon' TPU PJRT plugin via sitecustomize and
pins JAX_PLATFORMS=axon, so plain env overrides are ignored; we must switch
the platform through jax.config *after* import, before first computation.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)

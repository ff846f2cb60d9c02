import os

# the axon TPU plugin ignores JAX_PLATFORMS; force CPU via jax.config before
# anything touches the backend.  8 virtual CPU devices for sharding tests.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

import flamo_tpu


@pytest.fixture(autouse=True)
def _seed():
    flamo_tpu.set_seed(0)
    yield

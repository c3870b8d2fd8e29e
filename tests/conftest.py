import os

# Tests run on a virtual CPU mesh: multi-chip sharding is validated without
# TPU hardware (the driver separately dry-runs the multichip path). Forced
# (not setdefault): the environment may pin JAX_PLATFORMS to the tunneled
# TPU, which would make every jit in the suite pay remote-compile latency.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

# The axon TPU plugin (sitecustomize) pins jax_platforms="axon,cpu" via
# jax.config at interpreter startup, overriding the env var above; pin it
# back before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

EXTDATA = pathlib.Path(__file__).parent / "extdata"


@pytest.fixture(scope="session")
def extdata():
    return EXTDATA

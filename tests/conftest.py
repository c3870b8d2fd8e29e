import os

# Tests run on a virtual CPU mesh: multi-chip sharding is validated without
# TPU hardware (the driver separately dry-runs the multichip path).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import pathlib

import pytest

EXTDATA = pathlib.Path(__file__).parent / "extdata"


@pytest.fixture(scope="session")
def extdata():
    return EXTDATA

"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths (jax.sharding.Mesh over 'dp'/'mp') are exercised without TPU
hardware. Must run before jax initializes its backends."""

import os

# hard override: the ambient environment may export JAX_PLATFORMS=axon
# (remote TPU tunnel); tests must run on local virtual CPU devices
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin prepends itself to jax_platforms even when the env
# var requests cpu; force the config after import so tests REALLY run on
# the 8 virtual CPU devices
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeated test runs skip XLA recompilation.
# Shared with the dryrun/mp workers (same dir) so a test run pre-warms
# the driver's multichip certification and vice versa.
from agrl_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)

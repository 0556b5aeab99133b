import os
import sys

# tests run on a virtual 8-device CPU mesh (no TPU needed). The environment's
# site hook (axon) imports jax at interpreter startup, so JAX_PLATFORMS in
# os.environ is already baked — override through jax.config instead, and set
# XLA_FLAGS before the first backend initialization.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_DATA = "/root/reference/data"


def pytest_collection_modifyitems(items):
    """Every test not explicitly marked slow is fast: `pytest -m fast` is
    the sub-minute dev loop, `-m slow` the heavy render tier."""
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def smoke_brick():
    from volren_tpu.voldata import read_brick

    path = os.path.join(REFERENCE_DATA, "smoke.brick")
    if not os.path.exists(path):
        pytest.skip("reference smoke.brick not available")
    return read_brick(path)


@pytest.fixture(scope="session")
def table_mountain_env():
    from volren_tpu.scene.environment import Environment

    path = os.path.join(REFERENCE_DATA, "table_mountain_2_puresky_1k.hdr")
    if not os.path.exists(path):
        pytest.skip("reference envmap not available")
    return Environment(path)


@pytest.fixture(scope="session")
def random_grid16():
    """Small random dense grid with an empty border region."""
    rng = np.random.default_rng(7)
    dense = rng.random((16, 16, 16)).astype(np.float32) * 3.0
    dense[:4] = 0.0
    return dense

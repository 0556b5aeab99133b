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
# persistent CPU compilation cache: compiles are the bulk of the fast
# tier's wall time; keyed on HLO so it is always safe. Low thresholds so
# even small test programs persist.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


REFERENCE_DATA = "/root/reference/data"


# modules whose tests compile full render programs (tens of seconds of
# trace+lower each, and the persistent compile cache only skips the XLA
# stage): these form the mid `render` tier. Three tiers total:
#   -m fast    unit/property loop, <2 min on this box
#   -m render  integration renders (engines, sharding, CLI, goldens)
#   -m slow    heavy equivalence / eager-exactness renders
_RENDER_MODULES = {
    "test_integration_smoke", "test_goldens", "test_worklist",
    "test_sharding", "test_tf_emission", "test_denoiser", "test_cli_volpy",
    "test_render", "test_scripts", "test_pallas",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.get_closest_marker("slow") is not None:
            continue
        if item.module.__name__ in _RENDER_MODULES:
            item.add_marker(pytest.mark.render)
        else:
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

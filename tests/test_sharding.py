import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volren_tpu.ops.megakernel import render_wavefront
from volren_tpu.parallel.sharding import make_mesh, render_sharded


@pytest.fixture(scope="module")
def tiny_scene():
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import DenseGrid, Volume

    rng = np.random.default_rng(5)
    dense = rng.random((16, 16, 16)).astype(np.float32)
    r = Renderer()
    r.volume = Volume(DenseGrid(16, 16, 16, dense))
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.8))
    r.bounces = 8
    r.init(16, 16)
    r.commit()
    return r


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(tiny_scene, shape):
    r = tiny_scene
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    spp = 8
    single = np.asarray(
        render_wavefront(scene, params, cfg, 16, 16, jnp.int32(spp), jnp.int32(0))
    )
    mesh = make_mesh(n_tiles=shape[0], n_spp=shape[1])
    shard = np.asarray(
        render_sharded(scene, params, cfg, 16, 16, spp, 0, mesh)
    )
    # identical sample set; only psum order may differ
    np.testing.assert_allclose(shard, single, rtol=1e-5, atol=1e-5)


def test_sharded_tile_seeding_is_global(tiny_scene):
    """Row tiles must use global pixel indices: rendering rows 8..15 as a
    tile equals those rows of the full frame."""
    from volren_tpu.ops.megakernel import render_wavefront_tile

    r = tiny_scene
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    full = np.asarray(
        render_wavefront(scene, params, cfg, 16, 16, jnp.int32(4), jnp.int32(0))
    )
    tile = np.asarray(
        jax.jit(
            lambda s, p: render_wavefront_tile(
                s, p, cfg, 16, 8, jnp.int32(4), jnp.int32(0), jnp.int32(8), 16
            )[0]
        )(scene, params)
    )
    np.testing.assert_allclose(tile, full[8:], rtol=1e-6, atol=1e-7)


def test_sharded_host_matches_single(tiny_scene):
    from volren_tpu.parallel.sharding import render_sharded_host
    from volren_tpu.ops.megakernel import render_wavefront_host

    r = tiny_scene
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    single = np.asarray(render_wavefront_host(scene, params, cfg, 16, 16, 4, 0))
    mesh = make_mesh(n_tiles=8, n_spp=1)
    sharded = np.asarray(
        render_sharded_host(scene, params, cfg, 16, 16, 4, 0, mesh)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_sharded_queue_device_matches_single(tiny_scene):
    """The production engine's multi-chip form (device_queue under
    shard_map: shard-local while_loop drain + spp psum merge) matches the
    single-device device_queue render."""
    from volren_tpu.ops.worklist import render_wavefront_queue_device
    from volren_tpu.parallel.sharding import render_sharded_queue_device

    r = tiny_scene
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    single = np.asarray(
        render_wavefront_queue_device(
            scene, params, cfg, 16, 16, 4, 0, lanes=128, unroll=2
        )
    )
    mesh = make_mesh(n_tiles=4, n_spp=2)
    sharded = np.asarray(
        render_sharded_queue_device(
            scene, params, cfg, 16, 16, 4, 0, mesh, lanes=128, unroll=2
        )
    )
    np.testing.assert_allclose(sharded, single, rtol=3e-6, atol=1e-6)


@pytest.mark.slow
def test_sharded_queue_matches_single(tiny_scene):
    """Work-queue SPMD engine: per-device item queues over (tile x spp)
    shards, ICI psum only for the activity check. Stream-identical per
    (pixel, sample) to the single-device engines; sums reduce in fixed
    (spp shard, chunk) order."""
    from volren_tpu.ops.megakernel import render_wavefront_chunked
    from volren_tpu.parallel.sharding import render_sharded_queue

    r = tiny_scene
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    single = np.asarray(
        render_wavefront_chunked(scene, params, cfg, 16, 16, 4, 0, unroll=2)
    )
    mesh = make_mesh(n_tiles=4, n_spp=2)
    sharded = np.asarray(
        render_sharded_queue(
            scene, params, cfg, 16, 16, 4, 0, mesh, lanes=128, unroll=2
        )
    )
    np.testing.assert_allclose(sharded, single, rtol=3e-6, atol=1e-6)

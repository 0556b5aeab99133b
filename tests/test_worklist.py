"""Work-queue wavefront engine (ops/worklist.py).

Contracts: csize=spp produces the same per-lane sample streams and
per-pixel sum order as the fixed-lane engines (exact in eager semantics;
through jit, programs of different shape differ by ~1 ULP of fp
contraction — the stock engine shows the same wiggle across unroll
factors); csize<spp equals the sum of
per-chunk renders in fixed chunk order; lane-array size never changes
results."""

import numpy as np
import jax.numpy as jnp
import pytest

from volren_tpu.ops.megakernel import render_wavefront_chunked
from volren_tpu.ops.worklist import default_lanes, render_wavefront_queue
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import DenseGrid, Volume


@pytest.fixture(scope="module")
def small_scene():
    rng = np.random.default_rng(5)
    dense = rng.random((16, 16, 16)).astype(np.float32) * 2.0
    dense[:6] = 0.0
    r = Renderer()
    r.volume = Volume(DenseGrid(16, 16, 16, dense))
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.6))
    r.bounces = 8
    r.init(16, 16)
    r.commit()
    return r._scene_device(), r._trace_params(), r._config()


def test_default_lanes():
    assert default_lanes(1 << 20) == (1 << 20) // 8
    assert default_lanes(100) == 128  # clamped to the item count, padded
    assert default_lanes(4096) == 2048  # floor keeps tiny frames one wave


@pytest.mark.slow
def test_queue_bit_identical_eager(small_scene):
    """EXACT semantic identity, free of jit fp-contraction: un-jitted
    queue steps vs un-jitted fixed-lane steps must agree bit-for-bit.
    Slow tier: eager stepping can't reuse the compilation cache;
    test_queue_matches_chunked is the fast-tier equivalence check."""
    from volren_tpu.ops import megakernel as M
    from volren_tpu.ops import worklist as W

    scene, params, cfg = small_scene
    w = h = 12
    spp = 2

    s = M.init_state(w, h)
    sppj = jnp.asarray(spp, jnp.int32)
    zero = jnp.asarray(0, jnp.int32)
    for i in range(4000):
        s = M.step_body(s, scene, params, cfg, w, sppj, zero, h, 4, test_every=2)
        if i % 8 == 7 and not bool((s["mode"] != M.MODE_INACTIVE).any()):
            break
    a = np.asarray(s["accum"]).reshape(h, w, 4)

    lanes = 128
    q = W.init_queue_state(lanes)
    fb = jnp.zeros((w * h, 4), jnp.float32)
    cursor = jnp.zeros((8,), jnp.int32)
    for i in range(4000):
        q, fb, cursor = W.step_body_queue(
            q, fb, cursor, scene, params, cfg, w, h, 1, spp, spp, zero, 4,
            test_every=2,
        )
        if i % 8 == 7 and not bool((q["mode"] != M.MODE_INACTIVE).any()):
            break
    b = np.asarray(fb).reshape(h, w, 4)
    np.testing.assert_array_equal(a, b)


def test_queue_matches_chunked(small_scene):
    scene, params, cfg = small_scene
    a = np.asarray(render_wavefront_chunked(scene, params, cfg, 16, 16, 4, 0, unroll=4))
    b = np.asarray(
        render_wavefront_queue(scene, params, cfg, 16, 16, 4, 0, unroll=4, lanes=128)
    )
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6)


def test_queue_lane_count_invariance(small_scene):
    """The queue must produce the same image no matter how many lanes run
    it (items are self-contained; only scheduling changes)."""
    scene, params, cfg = small_scene
    a = np.asarray(
        render_wavefront_queue(scene, params, cfg, 16, 16, 4, 0, unroll=4, lanes=128)
    )
    b = np.asarray(
        render_wavefront_queue(scene, params, cfg, 16, 16, 4, 0, unroll=2, lanes=384)
    )
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6)


@pytest.mark.slow
def test_queue_chunked_items_match_chunk_order_sum(small_scene):
    """csize < spp: per-chunk sums are exact; the per-pixel reduction runs
    in fixed chunk order, i.e. equals rendering each chunk separately and
    summing in chunk order."""
    scene, params, cfg = small_scene
    q = np.asarray(
        render_wavefront_queue(
            scene, params, cfg, 16, 16, 4, 0, unroll=4, lanes=128, csize=2
        )
    )
    parts = [
        np.asarray(render_wavefront_chunked(scene, params, cfg, 16, 16, 2, k * 2, unroll=4))
        for k in range(2)
    ]
    np.testing.assert_allclose(q, parts[0] + parts[1], rtol=3e-6, atol=1e-6)


def test_queue_device_matches_host(small_scene):
    """The single-dispatch while_loop queue engine (one device program per
    render, zero host syncs) claims items and seeds samples identically to
    the host-stepped queue loop — same image up to jit fp-contraction."""
    from volren_tpu.ops.worklist import render_wavefront_queue_device

    scene, params, cfg = small_scene
    a = np.asarray(
        render_wavefront_queue(scene, params, cfg, 16, 16, 4, 0, lanes=128, csize=2)
    )
    b = np.asarray(
        render_wavefront_queue_device(
            scene, params, cfg, 16, 16, 4, 0, lanes=128, csize=2
        )
    )
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6)


def test_queue_dequeue_gating_invariance(small_scene):
    """dequeue_every > 1 (skip the claim/flush machinery on most steps —
    it is ~40% of full-step cost at 16k lanes, probes/results/attrib.jsonl)
    only reorders WHEN lanes pick up items; per-item sample streams and the
    fixed chunk-order sum are unchanged."""
    from volren_tpu.ops.worklist import render_wavefront_queue_device

    scene, params, cfg = small_scene
    a = np.asarray(
        render_wavefront_queue(scene, params, cfg, 16, 16, 4, 0, unroll=4,
                               lanes=128, csize=2, dequeue_every=1)
    )
    b = np.asarray(
        render_wavefront_queue(scene, params, cfg, 16, 16, 4, 0, unroll=4,
                               lanes=128, csize=2, dequeue_every=4)
    )
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6)
    # device variant at an explicit non-default gate (flush-path coverage)
    c = np.asarray(
        render_wavefront_queue_device(
            scene, params, cfg, 16, 16, 4, 0, unroll=2, lanes=128, csize=2,
            dequeue_every=2,
        )
    )
    np.testing.assert_allclose(a, c, rtol=3e-6, atol=1e-6)


def test_queue_device_tiled_dispatch(small_scene):
    """device=True through the tiled driver returns the same frame."""
    from volren_tpu.ops.worklist import render_wavefront_queue_tiled

    scene, params, cfg = small_scene
    a = np.asarray(
        render_wavefront_queue(scene, params, cfg, 16, 16, 2, 0, lanes=128, csize=2)
    )
    b = np.asarray(
        render_wavefront_queue_tiled(
            scene, params, cfg, 16, 16, 2, 0, tile_rows=8, lanes=128, csize=2,
            device=True,
        )
    )
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6)


def test_queue_tiled_matches_untiled(small_scene):
    """2D tile-block queue driver: per-item sample streams depend only on
    the absolute pixel, so any tiling reassembles the same image (tiles
    run through one program shape; frame dims/offsets are dynamic)."""
    from volren_tpu.ops.worklist import render_wavefront_queue_tiled

    scene, params, cfg = small_scene
    a = np.asarray(render_wavefront_queue(scene, params, cfg, 16, 16, 4, 0, lanes=128))
    b = np.asarray(
        render_wavefront_queue_tiled(
            scene, params, cfg, 16, 16, 4, 0, tile_rows=8, lanes=128
        )
    )
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6)


def test_queue_spp_base_offsets(small_scene):
    """Progressive accumulation: trace(2)+trace(2) through the queue engine
    equals one render(4) (same (pixel, sample) seeds)."""
    scene, params, cfg = small_scene
    a = np.asarray(render_wavefront_queue(scene, params, cfg, 16, 16, 4, 0, lanes=128))
    b0 = np.asarray(render_wavefront_queue(scene, params, cfg, 16, 16, 2, 0, lanes=128))
    b1 = np.asarray(render_wavefront_queue(scene, params, cfg, 16, 16, 2, 2, lanes=128))
    np.testing.assert_allclose(a, b0 + b1, rtol=3e-6, atol=1e-6)


def test_renderer_queue_engine(small_scene):
    rng = np.random.default_rng(5)
    dense = rng.random((16, 16, 16)).astype(np.float32) * 2.0
    dense[:6] = 0.0
    r = Renderer()
    r.volume = Volume(DenseGrid(16, 16, 16, dense))
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.6))
    r.bounces = 8
    r.init(16, 16)
    r.commit()
    r.engine = "wavefront"
    r.step_engine = "queue"
    r.queue_lanes = 128
    r.render(4)
    fb_queue = r.fbo_data()
    r.step_engine = "device"
    r.render(4)
    fb_dev = r.fbo_data()
    np.testing.assert_allclose(fb_queue, fb_dev, rtol=3e-6, atol=1e-6)
    assert np.isfinite(fb_queue).all() and fb_queue.mean() > 0.01


@pytest.mark.slow
def test_queue_tf_and_emission_paths(small_scene):
    """TF classification and emission flow through the queue engine's
    per-lane spp windows identically to the fixed-lane engines."""
    from volren_tpu.scene.transferfunc import TransferFunction

    rng = np.random.default_rng(9)
    dense = rng.random((16, 16, 16)).astype(np.float32) * 2.0
    emission = np.zeros((16, 16, 16), np.float32)
    emission[4:12, 4:12, 4:12] = 500.0
    r = Renderer()
    r.volume = Volume(DenseGrid(16, 16, 16, dense))
    r.volume.update_grid_frame(0, DenseGrid(16, 16, 16, emission), "flame")
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.5))
    r.set_transferfunc(TransferFunction("/root/reference/data/lut.txt"))
    r.bounces = 8
    r.init(16, 16)
    r.commit()
    scene, params, cfg = r._scene_device(), r._trace_params(), r._config()
    assert cfg.use_tf and cfg.has_emission
    a = np.asarray(render_wavefront_chunked(scene, params, cfg, 16, 16, 4, 0, unroll=2))
    b = np.asarray(
        render_wavefront_queue(scene, params, cfg, 16, 16, 4, 0, unroll=2, lanes=128)
    )
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6)
    assert np.isfinite(b).all() and b[..., :3].mean() > 0.0


def test_pack_state_roundtrip_bit_exact():
    """pack_state/unpack_state must be value-preserving for every dtype in
    the lane state (f32 concat/slice, u32<->i32 bitcast, bool widening) —
    the packed while-loop carry must not change a single sample."""
    from volren_tpu.ops.megakernel import pack_state, unpack_state
    from volren_tpu.ops.worklist import init_queue_state

    s = init_queue_state(64)
    rng = np.random.default_rng(2)
    # non-trivial values incl. negative zero, NaN payloads, full-range u32
    s["t"] = jnp.asarray(rng.standard_normal(64), jnp.float32)
    s["p_dir"] = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)
    s["t"] = s["t"].at[0].set(-0.0).at[1].set(jnp.nan).at[2].set(jnp.inf)
    s["seed"] = jnp.asarray(
        rng.integers(0, 1 << 32, 64, dtype=np.uint64).astype(np.uint32)
    )
    s["free"] = jnp.asarray(rng.integers(0, 2, 64).astype(bool))
    s["mode"] = jnp.asarray(rng.integers(-2, 5, 64, dtype=np.int32))
    F, I = pack_state(s)
    assert F.dtype == jnp.float32 and I.dtype == jnp.int32
    out = unpack_state(F, I, s)
    assert set(out) == set(s)
    for k in s:
        assert out[k].dtype == s[k].dtype and out[k].shape == s[k].shape, k
        # byte-level equality: exact for NaN payloads and -0.0 too
        assert np.asarray(out[k]).tobytes() == np.asarray(s[k]).tobytes(), k

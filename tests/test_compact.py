"""Lane-compaction correctness (ops/compact.py + megakernel call sites).

The contract under test: ANY compaction budget produces the bit-identical
image — overflow lanes are deferred to a later call, and per-lane rng
streams make deferral exact (only the steps-to-drain changes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from volren_tpu.ops.compact import budget, compact_apply, col_u32, pack_cols
from volren_tpu.ops.megakernel import render_wavefront_chunked
from volren_tpu.renderer import Renderer
from volren_tpu.scene.environment import Environment
from volren_tpu.voldata import DenseGrid, Volume


def test_budget_rounding():
    assert budget(65536, 0) == 0
    assert budget(65536, 1) == 0
    assert budget(65536, 8) == 8192
    assert budget(1000, 4) == 256
    assert budget(100, 4) == 0  # min budget would not shrink the work
    assert budget(65536 + 128, 8) % 128 == 0


def _double_fn(rows, m):
    v = rows[..., 0]
    sd = col_u32(rows, 1)
    return pack_cols(v * 2.0, sd + jnp.uint32(1), m)


def _check_serviced_outputs(out, vals, seeds, serviced):
    np.testing.assert_array_equal(
        np.asarray(out[..., 0])[serviced], np.asarray(vals)[serviced] * 2.0
    )
    np.testing.assert_array_equal(
        np.asarray(col_u32(out, 1))[serviced], np.asarray(seeds)[serviced] + 1
    )
    assert (np.asarray(out)[~serviced] == 0).all()


def test_compact_apply_topk_services_first_k_and_defers_overflow():
    n, k = 1024, 128
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.random(n) < 0.3)  # ~307 wanting lanes > k
    vals = jnp.asarray(rng.random(n).astype(np.float32))
    seeds = jnp.arange(n, dtype=jnp.uint32)

    out = jax.jit(lambda mk, iv: compact_apply(mk, iv, _double_fn, k, "topk"))(
        mask, pack_cols(vals, seeds)
    )
    serviced = np.asarray(out[..., 2] > 0)
    m_np = np.asarray(mask)
    # exactly k lanes were serviced, all of them wanting, and they are the
    # FIRST k wanting lanes (deterministic priority by index)
    assert serviced.sum() == k
    assert (m_np[serviced]).all()
    first_k = np.where(m_np)[0][:k]
    assert set(np.where(serviced)[0]) == set(first_k)
    _check_serviced_outputs(out, vals, seeds, serviced)


@pytest.mark.parametrize("n,k,p", [(1024, 128, 0.3), (1000, 256, 0.05), (576, 128, 0.9)])
def test_compact_apply_block_selector_contract(n, k, p):
    """Sort-free selector: each strided block (lane i in block i % k)
    services its FIRST masked lane; every serviced lane is masked; blocks
    with any masked lane always service one (no starvation within a call);
    outputs and zero-elsewhere match the topk path's contract."""
    rng = np.random.default_rng(7)
    mask = jnp.asarray(rng.random(n) < p)
    vals = jnp.asarray(rng.random(n).astype(np.float32))
    seeds = jnp.arange(n, dtype=jnp.uint32)

    out = jax.jit(lambda mk, iv: compact_apply(mk, iv, _double_fn, k, "block"))(
        mask, pack_cols(vals, seeds)
    )
    serviced = np.asarray(out[..., 2] > 0)
    m_np = np.asarray(mask)
    assert (m_np[serviced]).all()
    lanes = np.arange(n)
    for j in range(k):
        blk = lanes[lanes % k == j]
        blk_masked = blk[m_np[blk]]
        got = blk[serviced[blk]]
        if len(blk_masked):
            np.testing.assert_array_equal(got, blk_masked[:1])
        else:
            assert len(got) == 0
    _check_serviced_outputs(out, vals, seeds, serviced)


@pytest.fixture(scope="module")
def emitting_renderer():
    rng = np.random.default_rng(11)
    dense = rng.random((16, 16, 16)).astype(np.float32) * 2.5
    dense[:5] = 0.0
    emission = np.zeros((16, 16, 16), np.float32)
    emission[6:10, 6:10, 6:10] = rng.random((4, 4, 4)).astype(np.float32) * 800.0
    vol = Volume(DenseGrid(16, 16, 16, dense))
    vol.update_grid_frame(0, DenseGrid(16, 16, 16, emission), "flame")
    r = Renderer()
    r.volume = vol
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.6))
    r.bounces = 12
    r.init(24, 24)
    r.commit()
    return r


def _eager_render(scene, params, cfg, w, h, spp, max_steps=6000):
    """Un-jitted wavefront render: the EXACT per-lane semantics, free of
    compiler fp-contraction (jitted programs of different shapes differ by
    ~1 ULP even between unroll factors of the stock engine)."""
    import jax.numpy as jnp

    from volren_tpu.ops import megakernel as M

    s = M.init_state(w, h)
    sppj = jnp.asarray(spp, jnp.int32)
    zero = jnp.asarray(0, jnp.int32)
    for i in range(max_steps):
        alt = i % 2 == 1
        s = M.step_body(s, scene, params, cfg, w, sppj, zero, h, 4,
                        do_escape=alt, test_every=2, do_nee=alt)
        if i % 8 == 7 and not bool((s["mode"] != M.MODE_INACTIVE).any()):
            return np.asarray(s["accum"]).reshape(h, w, 4)
    raise AssertionError("no convergence")


@pytest.mark.parametrize(
    "divisors,selector",
    [
        # eager renders can't reuse the compilation cache, so the whole
        # family is slow-tier; test_compacted_render_jit_close is the fast
        # -tier compaction coverage
        pytest.param((4, 4, 4), "block", marks=pytest.mark.slow),
        pytest.param((4, 4, 4), "topk", marks=pytest.mark.slow),
        pytest.param((32, 32, 32), "block", marks=pytest.mark.slow),
        pytest.param((32, 32, 32), "topk", marks=pytest.mark.slow),
    ],
)
def test_compacted_render_bit_identical_eager(emitting_renderer, divisors, selector):
    """Aggressive budgets (including guaranteed overflow: 16x16=256 lanes
    at divisor 32 -> budget 128 < the first-step escape burst) must not
    change a single bit of the image, with EITHER lane selector. Eager
    path: exact semantics."""
    r = emitting_renderer
    scene, params = r._scene_device(), r._trace_params()
    cfg0 = r._config()
    dr, dn, de = divisors
    cfg1 = cfg0._replace(
        compact_resolve=dr, compact_nee=dn, compact_escape=de,
        compact_selector=selector,
    )
    assert cfg0.has_emission
    a = _eager_render(scene, params, cfg0, 16, 16, 3)
    b = _eager_render(scene, params, cfg1, 16, 16, 3)
    np.testing.assert_array_equal(a, b)


def test_compacted_render_jit_close(emitting_renderer):
    """Through jit, programs of different shape legitimately differ by
    ~1 ULP (fp contraction — the stock engine shows the same wiggle across
    unroll factors), so the jitted check is allclose-at-ULP, with the
    means exactly matched in double precision."""
    r = emitting_renderer
    scene, params = r._scene_device(), r._trace_params()
    cfg0 = r._config()
    cfg1 = cfg0._replace(compact_resolve=8, compact_nee=8, compact_escape=8)
    a = np.asarray(render_wavefront_chunked(scene, params, cfg0, 24, 24, 6, 0, unroll=4))
    b = np.asarray(render_wavefront_chunked(scene, params, cfg1, 24, 24, 6, 0, unroll=4))
    np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-6)


@pytest.mark.slow
def test_compacted_tf_render_bit_identical_eager(emitting_renderer):
    from volren_tpu.scene.transferfunc import TransferFunction

    r = emitting_renderer
    r.set_transferfunc(TransferFunction("/root/reference/data/lut.txt"))
    try:
        scene, params = r._scene_device(), r._trace_params()
        cfg0 = r._config()
        assert cfg0.use_tf
        cfg1 = cfg0._replace(compact_resolve=8, compact_nee=8, compact_escape=8)
        a = _eager_render(scene, params, cfg0, 16, 16, 2)
        b = _eager_render(scene, params, cfg1, 16, 16, 2)
        np.testing.assert_array_equal(a, b)
    finally:
        r.set_transferfunc(None)

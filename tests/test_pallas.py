"""Pallas megakernel engine (ops/pallas): correctness on the CPU
interpreter against the chunked XLA engine.

The kernel's samples follow the same per-(pixel, sample) TEA streams as
the XLA engines, but three documented substitutions make comparisons
statistical rather than bitwise: the NEE env sample comes from a
pre-drawn alias pool (unbiased sample reuse), the escape env fetch is a
stochastic-bilinear tap (E = the reference's bilinear), and Mosaic may
contract float chains differently. The acceptance bar: the kernel image
must sit within the engines' own disjoint-sample noise (measured here),
and the engine must be deterministic.
"""

import numpy as np
import pytest

import jax


def _tiny_renderer(random_grid16, seed=123, res=32):
    from volren_tpu.renderer import Renderer
    from volren_tpu.scene.environment import Environment
    from volren_tpu.voldata import DenseGrid, Volume

    r = Renderer()
    r.volume = Volume(DenseGrid(16, 16, 16, random_grid16))
    r.scale_and_move_to_unit_cube()
    r.set_environment(Environment.white(0.7))
    r.bounces = 16
    r.seed = seed
    r.init(res, res)
    r.commit()
    return r


def test_scan_gather_exact():
    """mask-reduce gather (interpret mode) == numpy fancy indexing."""
    from volren_tpu.ops.pallas.kernel import _scan_gather
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(3)
    rows = 384  # 3 blocks of 128
    tf32 = rng.random((rows, 128)).astype(np.float32)
    ti32 = rng.integers(0, 2**20, (rows, 128)).astype(np.int32)
    r = rng.integers(0, rows, (8, 128)).astype(np.int32)
    c = rng.integers(0, 128, (8, 128)).astype(np.int32)

    def kernel(t1, t2, rr, cc, o1, o2):
        a, b = _scan_gather([t1[:], t2[:]], rr[:], cc[:], rows)
        o1[:] = a
        o2[:] = b

    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=True,
    )(tf32, ti32, r, c)
    assert np.array_equal(np.asarray(out[0]), tf32[r, c])
    assert np.array_equal(np.asarray(out[1]), ti32[r, c])


def test_supports_scene_gate(random_grid16):
    r = _tiny_renderer(random_grid16)
    from volren_tpu.ops.pallas import supports_scene

    scene, cfg = r._scene_device(), r._config()
    assert supports_scene(scene, cfg)
    assert not supports_scene(scene, cfg._replace(use_tf=True))


def test_kernel_matches_chunked_statistically(random_grid16):
    """Kernel image within the chunked engine's own sample noise, and
    deterministic across calls."""
    import jax.numpy as jnp
    from volren_tpu.ops.megakernel import render_wavefront_chunked

    r = _tiny_renderer(random_grid16)
    scene, params = r._scene_device(), r._trace_params()
    cfg = r._config()._replace(use_onehot=False, env_nearest_nee=True)
    SPP, RES = 8, 32

    ref = np.asarray(render_wavefront_chunked(
        scene, params, cfg, RES, RES, SPP, 0)) / SPP
    ref2 = np.asarray(render_wavefront_chunked(
        scene, params, cfg, RES, RES, SPP, SPP)) / SPP
    noise = np.sqrt(((ref2 - ref) ** 2).mean())

    r.step_engine = "pallas"
    r.trace(SPP)
    img = np.asarray(r.fbo_data())
    # fbo_data returns the running mean; rebuild the raw mean
    got = np.asarray(r._fb)

    rmse = np.sqrt(((got - ref) ** 2).mean())
    mean_rel = abs(got[..., :3].mean() - ref[..., :3].mean()) / max(
        ref[..., :3].mean(), 1e-9)
    assert rmse < 1.5 * noise, (rmse, noise)
    assert mean_rel < 0.05, mean_rel

    # determinism: a fresh renderer reproduces the image bitwise
    r2 = _tiny_renderer(random_grid16)
    r2.step_engine = "pallas"
    r2.trace(SPP)
    assert np.array_equal(np.asarray(r2._fb), got)


def test_queue_mode_matches_strip(random_grid16):
    """Work-queue mode (in-kernel dequeue + MXU outer-product flush
    scatter) produces the SAME image as the fixed strip mode: identical
    per-(pixel, sample) streams, lane assignment is pure scheduling."""
    r = _tiny_renderer(random_grid16)
    scene, params = r._scene_device(), r._trace_params()
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import build_env_pool, build_params_rows

    packed = pack_scene(scene)
    pool = build_env_pool(scene, 123, 0)
    pf, pi = build_params_rows(scene, params, 32, 32, 0)
    a = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2))
    b = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                 queue_items=1024))
    assert np.array_equal(a, b)


def test_sublanes_match(random_grid16):
    """Wider lane blocks ((16,128), (32,128)) are pure scheduling: the
    per-(pixel, sample) TEA streams don't depend on which lane serves a
    sample, so the image is bitwise identical to the (8,128) default."""
    r = _tiny_renderer(random_grid16)
    scene, params = r._scene_device(), r._trace_params()
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import build_env_pool, build_params_rows

    packed = pack_scene(scene)
    pool = build_env_pool(scene, 123, 0)
    pf, pi = build_params_rows(scene, params, 32, 32, 0)
    base = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                    queue_items=1024))
    # 32 sublanes = 4096 lanes > 1024 items also exercises the
    # inactive-surplus-lane path of the dequeue
    for sub in (16, 32):
        wide = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                        queue_items=1024, sublanes=sub))
        assert np.array_equal(base, wide), sub


def _chunked_ref_and_noise(r, spp, res):
    from volren_tpu.ops.megakernel import render_wavefront_chunked

    scene, params = r._scene_device(), r._trace_params()
    cfg = r._config()._replace(use_onehot=False, env_nearest_nee=True)
    ref = np.asarray(render_wavefront_chunked(
        scene, params, cfg, res, res, spp, 0)) / spp
    ref2 = np.asarray(render_wavefront_chunked(
        scene, params, cfg, res, res, spp, spp)) / spp
    noise = np.sqrt(((ref2 - ref) ** 2).mean())
    return ref, noise


def test_tf_kernel_matches_chunked(random_grid16):
    """TF kernel variant (trilinear classification through the LUT
    alpha + rgb tint, pre-baked TF majorant table) within the chunked
    engine's own sample noise (round-3 verdict #2)."""
    from volren_tpu.scene.transferfunc import TransferFunction

    r = _tiny_renderer(random_grid16)
    r.set_transferfunc(TransferFunction(
        [(0.9, 0.2, 0.1, 0.0), (0.2, 0.9, 0.6, 0.7), (1.0, 1.0, 1.0, 1.0)]))
    SPP, RES = 8, 32
    ref, noise = _chunked_ref_and_noise(r, SPP, RES)

    r.step_engine = "pallas"
    r.trace(SPP)
    got = np.asarray(r._fb)
    rmse = np.sqrt(((got - ref) ** 2).mean())
    mean_rel = abs(got[..., :3].mean() - ref[..., :3].mean()) / max(
        ref[..., :3].mean(), 1e-9)
    assert np.isfinite(got).all()
    assert rmse < 1.5 * noise, (rmse, noise)
    assert mean_rel < 0.05, mean_rel


def test_emission_kernel_matches_chunked(random_grid16):
    """Emission kernel variant (second brick-grid fetch in resolve)
    within the chunked engine's own sample noise."""
    from volren_tpu.voldata import DenseGrid

    r = _tiny_renderer(random_grid16)
    zz, yy, xx = np.meshgrid(*([np.arange(16)] * 3), indexing="ij")
    dist = np.sqrt((xx - 8) ** 2 + (yy - 8) ** 2 + (zz - 8) ** 2)
    temp = np.clip(1.0 - dist / 8.0, 0.0, 1.0).astype(np.float32)
    r.volume.update_grid_frame(0, DenseGrid(16, 16, 16, temp), "flame")
    r.commit()
    assert r._config().has_emission
    r.emission_scale = 30.0
    r.albedo = np.full(3, 0.6, np.float32)
    SPP, RES = 8, 32
    ref, noise = _chunked_ref_and_noise(r, SPP, RES)

    r.step_engine = "pallas"
    r.trace(SPP)
    got = np.asarray(r._fb)
    rmse = np.sqrt(((got - ref) ** 2).mean())
    mean_rel = abs(got[..., :3].mean() - ref[..., :3].mean()) / max(
        ref[..., :3].mean(), 1e-9)
    assert np.isfinite(got).all()
    assert rmse < 1.5 * noise, (rmse, noise)
    assert mean_rel < 0.05, mean_rel


def test_mxu_gather_bitexact(random_grid16):
    """The one-hot MXU fetch engine matches the dynamic_gather scans
    bitwise on every serving path: compacted (default), full-lane, and
    the full-32-bit i32 payload split (atlas + RGBE env words ride as
    two exact 16-bit f32 halves).

    CPU-interpreter only, so this certifies INDEXING, not TPU numerics:
    the interpreter runs true-f32 dots and cannot detect Mosaic's bf16
    dot truncation (pallas13/14). The on-TPU numeric audit is
    probes/probe_pallas13/15.py (probes/results/pallas13/15.jsonl)."""
    r = _tiny_renderer(random_grid16)
    scene = r._scene_device()
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import build_env_pool, build_params_rows

    packed = pack_scene(scene)
    pool = build_env_pool(scene, 123, 0)
    pf, pi = build_params_rows(scene, r._trace_params(), 32, 32, 0)
    for kw in (dict(queue_items=1024),
               dict(queue_items=1024, resolve_full=True,
                    escape_full=True, nee_full=True)):
        a = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                     **kw))
        b = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                     mxu_gather=True, **kw))
        assert np.array_equal(a, b), kw


def test_kernel_plan_modes(random_grid16):
    """kernel_plan: small scenes run all-VMEM; scenes whose atlas
    exceeds the VMEM gate (but whose meta/mips/env fit) run in hbm
    mode; monster meta tables are rejected (round-5 scale axis,
    /root/reference/README.md:6-8)."""
    import jax.numpy as jnp

    r = _tiny_renderer(random_grid16)
    from volren_tpu.ops.pallas import kernel_plan

    scene, cfg = r._scene_device(), r._config()
    assert kernel_plan(scene, cfg) == "vmem"
    # inflate the atlas beyond the 12288-slot VMEM gate (kernel_plan
    # reads shapes only, so ShapeDtypeStructs stand in for arrays)
    big = scene.density._replace(
        atlas=jax.ShapeDtypeStruct((60000, 512), jnp.uint8))
    assert kernel_plan(scene._replace(density=big), cfg) == "hbm"
    # monster brick count: meta tables alone exceed the VMEM budget
    huge = big._replace(brick_meta=jax.ShapeDtypeStruct(
        (128, 1024, 1024, 3), jnp.float32))
    assert kernel_plan(scene._replace(density=huge), cfg) is None


def test_hbm_atlas_bitwise_matches_vmem(random_grid16):
    """The HBM-atlas DMA row-gather fetch engine is bitwise identical
    to the VMEM compacted scan: same serve schedule, same rng streams,
    only the fetch transport differs (interpret mode; the on-TPU
    bitwise smoke is probes/probe_hbm.py — Mosaic lowering is NOT
    certified here, round-4 lesson)."""
    r = _tiny_renderer(random_grid16)
    scene = r._scene_device()
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import build_env_pool, build_params_rows

    packed = pack_scene(scene)
    pool = build_env_pool(scene, 123, 0)
    pf, pi = build_params_rows(scene, r._trace_params(), 32, 32, 0)
    for kw in (dict(queue_items=1024),
               dict(queue_items=1024, resolve_rounds=3, sublanes=16)):
        a = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                     resolve_full=False, **kw))
        b = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                     resolve_full=False, hbm_atlas=True,
                                     **kw))
        assert np.array_equal(a, b), kw


def test_hbm_atlas_tf_bitwise(random_grid16):
    """TF kernel variant through the HBM atlas (the trilinear
    classification's 8-corner fetches ride the DMA row-gather) ==
    the VMEM TF kernel, bitwise (interpret)."""
    from volren_tpu.scene.transferfunc import TransferFunction

    r = _tiny_renderer(random_grid16)
    r.set_transferfunc(TransferFunction(
        [(0.9, 0.2, 0.1, 0.0), (0.2, 0.9, 0.6, 0.7), (1.0, 1.0, 1.0, 1.0)]))
    scene = r._scene_device()
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import build_env_pool, build_params_rows
    from volren_tpu.ops.transfer import tf_alpha_majorant

    params = r._trace_params()
    packed = pack_scene(scene, use_tf=True)
    pool = build_env_pool(scene, 123, 0)
    pf, pi = build_params_rows(scene, params, 32, 32, 0)
    raw = packed.mip_maj
    d_norm = params.density_scale * raw * params.inv_majorant
    mip_tf = params.majorant * tf_alpha_majorant(
        scene.tf, d_norm.reshape(-1), onehot=False).reshape(raw.shape)
    a = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                 queue_items=1024, mip_override=mip_tf))
    b = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                 queue_items=1024, mip_override=mip_tf,
                                 hbm_atlas=True))
    assert np.array_equal(a, b)


def test_mip_u8_quantize_up(random_grid16):
    """build_mip_u8 decode DOMINATES the true majorant at every pyramid
    entry (the null-collision unbiasedness contract,
    common.glsl:399-501) and stays within one quantization step."""
    r = _tiny_renderer(random_grid16)
    scene = r._scene_device()
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.pack import _mip_level_slices, build_mip_u8

    packed = pack_scene(scene)
    words, lo4, sc4 = build_mip_u8(packed.mip_maj, packed.meta)
    w = np.asarray(words).reshape(-1)
    q = np.stack([(w >> (8 * b)) & 255 for b in range(4)],
                 axis=1).reshape(-1)
    flat = np.asarray(packed.mip_maj).reshape(-1)
    lo4, sc4 = np.asarray(lo4), np.asarray(sc4)
    for m, (off, n) in enumerate(_mip_level_slices(packed.meta)):
        true = flat[off:off + n]
        dec = lo4[m] + q[off:off + n].astype(np.float32) * sc4[m]
        assert (dec >= true - 1e-7 * np.abs(true)).all(), m
        assert (dec - true <= 2.0 * max(sc4[m], 1e-12) + 1e-6).all(), m
    # exact-zero majorants must stay exactly zero when the level's
    # minimum is zero (empty-space skipping intact)
    lev0 = flat[:_mip_level_slices(packed.meta)[0][1]]
    if (lev0 == 0).any() and lo4[0] == 0.0:
        dec0 = lo4[0] + q[:lev0.shape[0]][lev0 == 0] * sc4[0]
        assert (dec0 == 0.0).all()


def test_mip_u8_kernel_statistical(random_grid16):
    """The u8-mip kernel's image sits within the engine's own sample
    noise of the f32-mip kernel (different majorants -> different
    collision schedules -> different but equally unbiased samples)."""
    r = _tiny_renderer(random_grid16)
    SPP = 8
    r.step_engine = "pallas"
    r.pallas_mip_u8 = "0"
    r.trace(SPP)
    f32_img = np.asarray(r._fb)

    r2 = _tiny_renderer(random_grid16)
    r2.step_engine = "pallas"
    r2.pallas_mip_u8 = "1"
    r2.trace(SPP)
    u8_img = np.asarray(r2._fb)

    # disjoint-sample noise of the same engine as the yardstick
    r3 = _tiny_renderer(random_grid16, seed=321)
    r3.step_engine = "pallas"
    r3.pallas_mip_u8 = "0"
    r3.trace(SPP)
    noise = np.sqrt(((np.asarray(r3._fb) - f32_img) ** 2).mean())

    assert np.isfinite(u8_img).all()
    rmse = np.sqrt(((u8_img - f32_img) ** 2).mean())
    assert rmse < 1.5 * max(noise, 1e-6), (rmse, noise)
    mean_rel = abs(u8_img[..., :3].mean() - f32_img[..., :3].mean()) / max(
        f32_img[..., :3].mean(), 1e-9)
    assert mean_rel < 0.05, mean_rel


def test_pool_rgbe_serve(random_grid16):
    """5-table RGBE NEE pool serve: radiance decodes within 1/256 of
    the f32 channels, directions/pdf untouched, and the render stays
    within the engine's own sample-noise band of the 7-table form."""
    r = _tiny_renderer(random_grid16)
    scene = r._scene_device()
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import (
        build_env_pool, build_params_rows, rgbe_decode_np)

    pool = build_env_pool(scene, 123, 0)
    le = np.stack([np.asarray(pool[k]).reshape(-1)
                   for k in ("ler", "leg", "leb")], axis=-1)
    dec = rgbe_decode_np(np.asarray(pool["lergbe"]).reshape(-1))
    scale = np.maximum(np.abs(le).max(axis=-1, keepdims=True), 1e-30)
    assert (np.abs(dec - le) / scale).max() < 1.0 / 255.0

    packed = pack_scene(scene)
    pf, pi = build_params_rows(scene, r._trace_params(), 32, 32, 0)
    a = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 4,
                                 queue_items=1024))
    b = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 4,
                                 queue_items=1024, pool_rgbe=True))
    assert np.isfinite(b).all()
    rel = abs(b[:, :3].mean() - a[:, :3].mean()) / max(
        a[:, :3].mean(), 1e-9)
    assert rel < 0.02, rel


def test_resolve_bound_bitwise(random_grid16):
    """Range-bound resolve classify (kernel bound_cls / bound_cmp) is
    bitwise identical to the unbound paths on BOTH serve shapes: the
    brick meta's exact f32 decode bounds determine every skipped lane's
    decision (monotone op-order argument in the kernel), u_cls rides
    the same per-lane stream position, and phase B always covers the
    ambiguous subset (need is a subset of act at equal capacity).
    Interpret mode; the on-TPU audit is probes/results/rbound{,2}.jsonl."""
    r = _tiny_renderer(random_grid16)
    scene = r._scene_device()
    from volren_tpu.ops.pallas import pack_scene
    from volren_tpu.ops.pallas.kernel import render_strips
    from volren_tpu.ops.pallas.pack import build_env_pool, build_params_rows

    packed = pack_scene(scene)
    pool = build_env_pool(scene, 123, 0)
    pf, pi = build_params_rows(scene, r._trace_params(), 32, 32, 0)
    base = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                    queue_items=1024, resolve_full=False,
                                    resolve_bound=0))
    for kw in (dict(resolve_full=False, resolve_bound=1),
               dict(resolve_full=False, resolve_bound=1, hbm_atlas=True),
               dict(resolve_full=True, resolve_bound=0),
               dict(resolve_full=True, resolve_bound=2)):
        got = np.asarray(render_strips(packed, pool, pf, pi, 1024, 32, 2,
                                       queue_items=1024, **kw))
        assert np.array_equal(base, got), kw

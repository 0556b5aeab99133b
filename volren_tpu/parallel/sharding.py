"""Multi-device rendering: pixel-tile x spp sharding over a TPU mesh.

The reference is strictly single-GPU (one dispatch_compute per spp,
SURVEY 2c). The TPU-native scaling model: a 2D ``Mesh`` with axes

  tiles — horizontal bands of the frame (each device owns its rows; the
          volume is replicated so tracing needs NO cross-device traffic),
  spp   — sample batches (disjoint current_sample ranges per shard,
          merged with an ICI psum).

Because per-sample seeding is a pure function of (global pixel index,
sample index) — tea(seed * pix, sample) — a sharded render produces the
SAME sample set as a single device, so results are identical up to
floating-point reduction order.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.megakernel import render_wavefront_tile, safety_steps


def make_mesh(n_tiles: int | None = None, n_spp: int = 1, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n_tiles is None:
        n_tiles = n // n_spp
    assert n_tiles * n_spp == n, f"{n_tiles}x{n_spp} mesh != {n} devices"
    import numpy as np

    return Mesh(np.asarray(devices).reshape(n_tiles, n_spp), ("tiles", "spp"))


def render_sharded(scene, params, cfg, width, height, spp, spp_base, mesh: Mesh,
                   k_march=None):
    """Render a full frame across ``mesh``; returns the (H, W, 4) sample SUM
    (same contract as ops.megakernel.render_wavefront).

    TPU-native SPMD: the lane state is built EAGERLY, replicated ``n_spp``
    times (disjoint per-replica sample ranges carried as a per-lane
    spp_base vector), laid out rep-major so a flat P(("spp", "tiles"))
    sharding gives device (si, ti) its row band of sample batch si. The
    wavefront advances via a HOST loop over shard_mapped unrolled megastep
    programs — device-side loops scalarize gathers on TPU (ops.gather) —
    and the final accumulators merge with an ICI psum over the spp axis."""
    from ..ops import megakernel as M

    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    assert height % n_tiles == 0, f"height {height} not divisible by {n_tiles} tiles"
    assert spp % n_spp == 0, f"spp {spp} not divisible by {n_spp} spp shards"
    local_spp = spp // n_spp
    if k_march is None:
        k_march = M._default_k_march()
    unroll = M._default_unroll()

    lane_spec = P(("spp", "tiles"))
    shard1 = NamedSharding(mesh, lane_spec)
    shard2 = NamedSharding(mesh, P(("spp", "tiles"), None))
    repl = NamedSharding(mesh, P())

    state = M.init_state(width, height, reps=n_spp)
    state = {k: jax.device_put(v, shard2 if v.ndim == 2 else shard1)
             for k, v in state.items()}
    n_pix = width * height
    base_vec = jax.device_put(
        jnp.asarray(
            (np.arange(n_pix * n_spp) // n_pix) * local_spp + int(spp_base),
            jnp.int32,
        ),
        shard1,
    )
    scene = jax.device_put(scene, repl)
    params = jax.device_put(params, repl)

    def megastep(state, scene, params, base_vec):
        for _ in range(unroll):
            state = M.step_body(
                state, scene, params, cfg, width,
                jnp.int32(local_spp), base_vec, height, k_march,
            )
        return state

    step_fn = jax.jit(
        jax.shard_map(
            megastep,
            mesh=mesh,
            in_specs=(lane_spec, P(), P(), lane_spec),
            out_specs=lane_spec,
            check_vma=False,
        )
    )

    def any_active(state):
        return lax.psum(
            (state["mode"] != M.MODE_INACTIVE).sum(), ("spp", "tiles")
        ) > 0

    active_fn = jax.jit(
        jax.shard_map(
            any_active, mesh=mesh, in_specs=(lane_spec,), out_specs=P(),
            check_vma=False,
        )
    )

    def merge(state):
        return lax.psum(state["accum"], "spp")

    merge_fn = jax.jit(
        jax.shard_map(
            merge, mesh=mesh, in_specs=(lane_spec,), out_specs=lane_spec,
            check_vma=False,
        )
    )

    max_steps = safety_steps(int(local_spp), params.bounces)
    steps = 0
    while True:
        for _ in range(2):
            state = step_fn(state, scene, params, base_vec)
        steps += 2 * unroll
        if not bool(active_fn(state)):
            break
        if steps > max_steps:
            raise RuntimeError(f"sharded render did not converge after {steps} steps")
    acc = merge_fn(state)
    # after the psum every spp replica holds the merged sum; take replica 0
    return np.asarray(acc)[:n_pix].reshape(height, width, 4)


def render_sharded_queue(scene, params, cfg, width, height, spp, spp_base,
                         mesh: Mesh, lanes=None, csize=None, k_march=None,
                         unroll=None, check_every=2, test_every=None):
    """Work-queue render across ``mesh`` (ops/worklist.py semantics,
    SPMD): each device runs an INDEPENDENT queue over its (row band x spp
    batch) items — the dequeue cumsum and cursor are shard-local, so
    tracing needs no cross-device traffic at all; only the activity check
    rides an ICI psum. Returns the (H, W, 4) sample SUM.

    Per-pixel sums reduce in fixed (spp shard, chunk) order —
    deterministic for a given (mesh, spp, csize), and stream-identical to
    the single-device engines per (pixel, sample)."""
    from ..ops import megakernel as M
    from ..ops import worklist as W

    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    n_dev = n_tiles * n_spp
    assert height % n_tiles == 0, f"height {height} not divisible by {n_tiles} tiles"
    assert spp % n_spp == 0, f"spp {spp} not divisible by {n_spp} spp shards"
    rows = height // n_tiles
    local_spp = spp // n_spp
    csize = local_spp if csize is None else min(int(csize), local_spp)
    n_chunks = -(-local_spp // csize)
    n_pix_local = width * rows
    n_items_local = n_pix_local * n_chunks
    lanes_local = lanes or W.default_lanes(n_items_local)
    if k_march is None:
        k_march = M._default_k_march()
    if unroll is None:
        unroll = M._default_unroll()
    if test_every is None:
        test_every = M.DEFAULT_TEST_EVERY

    lane_spec = P(("spp", "tiles"))
    shard1 = NamedSharding(mesh, lane_spec)
    shard2 = NamedSharding(mesh, P(("spp", "tiles"), None))
    repl = NamedSharding(mesh, P())

    # eager global init; every lane slice is a valid local init (px/py are
    # assigned at dequeue)
    state = W.init_queue_state(lanes_local * n_dev)
    state = {k: jax.device_put(v, shard2 if v.ndim == 2 else shard1)
             for k, v in state.items()}
    fb = jax.device_put(jnp.zeros((n_items_local * n_dev, 4), jnp.float32), shard2)
    cursor = jax.device_put(jnp.zeros((8 * n_dev,), jnp.int32), shard1)
    scene = jax.device_put(scene, repl)
    params = jax.device_put(params, repl)
    spp_base = jnp.asarray(spp_base, jnp.int32)

    def megastep(state, fb, cursor, scene, params, spp_base):
        row0 = lax.axis_index("tiles") * rows
        sppb = lax.axis_index("spp").astype(jnp.int32) * local_spp + spp_base
        for i in range(unroll):
            alt = (i % 2 == 1) or unroll == 1
            state, fb, cursor = W.step_body_queue(
                state, fb, cursor, scene, params, cfg, width, height,
                n_chunks, csize, local_spp, sppb, k_march,
                do_escape=alt, test_every=test_every, do_nee=alt, row0=row0,
            )
        n_active = jnp.broadcast_to(
            lax.psum(
                (state["mode"] != M.MODE_INACTIVE).sum(dtype=jnp.int32),
                ("spp", "tiles"),
            ),
            (8,),
        )
        return state, fb, cursor, n_active

    step_fn = jax.jit(
        jax.shard_map(
            megastep,
            mesh=mesh,
            in_specs=(lane_spec, lane_spec, lane_spec, P(), P(), P()),
            out_specs=(lane_spec, lane_spec, lane_spec, P()),
            check_vma=False,
        )
    )

    max_steps = safety_steps(csize, params.bounces) * (n_items_local // lanes_local + 2)
    steps = 0
    while True:
        for _ in range(check_every):
            state, fb, cursor, n_active = step_fn(
                state, fb, cursor, scene, params, spp_base
            )
        steps += check_every * unroll
        if int(np.asarray(n_active)[0]) == 0:
            break
        if steps > max_steps:
            raise RuntimeError(
                f"sharded queue render did not converge after {steps} steps"
            )
    # global fb layout: ((spp, tiles), item) with item = pix * n_chunks + c
    img = (
        np.asarray(fb)
        .reshape(n_spp, n_tiles, n_pix_local, n_chunks, 4)
        .sum(axis=(0, 3))  # fixed (spp shard, chunk) reduction order
    )
    return img.reshape(height, width, 4)


def render_sharded_queue_device(scene, params, cfg, width, height, spp,
                                spp_base, mesh: Mesh, lanes=None, csize=None,
                                k_march=None, unroll=4, test_every=None):
    """The production engine (device_queue) across ``mesh``: each device
    runs the WHOLE work-queue render for its (row band x spp batch) as one
    on-device lax.while_loop inside shard_map — the multi-chip form of
    ops.worklist.render_wavefront_queue_device and the scaling path for
    the TPU default engine (SURVEY 2c).

    The while_loop cond is shard-LOCAL (each queue drains independently;
    no collectives inside the loop, so shards never wait on each other's
    stragglers), and the spp-axis accumulator merge is an ICI psum in a
    second tiny shard_mapped program. Per-(pixel, sample) TEA seeds make
    the sample set identical to the single-device engines; per-pixel sums
    reduce in fixed (spp shard, chunk) order."""
    from ..ops import megakernel as M
    from ..ops import worklist as W

    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    n_dev = n_tiles * n_spp
    assert height % n_tiles == 0, f"height {height} not divisible by {n_tiles} tiles"
    assert spp % n_spp == 0, f"spp {spp} not divisible by {n_spp} spp shards"
    rows = height // n_tiles
    local_spp = spp // n_spp
    csize = local_spp if csize is None else min(int(csize), local_spp)
    n_chunks = -(-local_spp // csize)
    n_pix_local = width * rows
    n_items_local = n_pix_local * n_chunks
    if lanes is None:
        # same sizing rule as the single-device engine (worklist.py): with
        # zero per-step dispatch cost small lane arrays win
        lanes = min(32768, max(4096, -(-n_items_local // 128 // 128) * 128))
        lanes = min(-(-n_items_local // 128) * 128, lanes)
    if k_march is None:
        k_march = M._default_k_march()
    if test_every is None:
        test_every = 4  # post-gating optimum at every lane count (gate2/3)

    lane_spec = P(("spp", "tiles"))
    shard1 = NamedSharding(mesh, lane_spec)
    shard2 = NamedSharding(mesh, P(("spp", "tiles"), None))
    repl = NamedSharding(mesh, P())

    state = W.init_queue_state(lanes * n_dev)
    state = {k: jax.device_put(v, shard2 if v.ndim == 2 else shard1)
             for k, v in state.items()}
    fb = jax.device_put(jnp.zeros((n_items_local * n_dev, 4), jnp.float32), shard2)
    cursor = jax.device_put(jnp.zeros((8 * n_dev,), jnp.int32), shard1)
    scene = jax.device_put(scene, repl)
    params = jax.device_put(params, repl)
    spp_base = jnp.asarray(spp_base, jnp.int32)

    def device_queue(state, fb, cursor, scene, params, spp_base):
        row0 = lax.axis_index("tiles") * rows
        sppb = lax.axis_index("spp").astype(jnp.int32) * local_spp + spp_base
        max_iters = (
            (jnp.int32(4096) + jnp.int32(512) * jnp.int32(csize))
            * (jnp.maximum(params.bounces, 32) // 32 + 1)
            * jnp.int32(n_items_local // lanes + 2)
        )

        def cond(c):
            s, fb_, cur, it = c
            live = (s["mode"] != M.MODE_INACTIVE).any() | (
                cur[0] < n_items_local
            )
            return live & (it < max_iters)

        def body(c):
            s, fb_, cur, it = c
            for i in range(unroll):
                alt = (i % 2 == 1) or unroll == 1
                s, fb_, cur = W.step_body_queue(
                    s, fb_, cur, scene, params, cfg, width, height,
                    n_chunks, csize, local_spp, sppb, k_march,
                    do_escape=alt, test_every=test_every, do_nee=alt,
                    row0=row0, do_dequeue=(i % unroll == 0),
                )
            return s, fb_, cur, it + unroll

        state, fb, cursor, it = lax.while_loop(
            cond, body, (state, fb, cursor, jnp.int32(0))
        )
        # flush items finished inside the final gated window
        s, fb, cur = W.dequeue_body(
            state, fb, cursor, n_chunks, csize, local_spp, sppb, width,
            row0,
        )
        return fb, jnp.broadcast_to(it, (8,))

    run_fn = jax.jit(
        jax.shard_map(
            device_queue,
            mesh=mesh,
            in_specs=(lane_spec, lane_spec, lane_spec, P(), P(), P()),
            out_specs=(lane_spec, lane_spec),
            check_vma=False,
        )
    )
    fb, _it = run_fn(state, fb, cursor, scene, params, spp_base)

    if n_spp > 1:
        # merge sample batches across the spp axis with an ICI psum; every
        # spp replica then holds the merged per-item sums for its tile band
        def merge(fb):
            return lax.psum(fb, "spp")

        merge_fn = jax.jit(
            jax.shard_map(
                merge, mesh=mesh, in_specs=(lane_spec,), out_specs=lane_spec,
                check_vma=False,
            )
        )
        fb = merge_fn(fb)
        img = (
            np.asarray(fb)
            .reshape(n_spp, n_tiles, n_pix_local, n_chunks, 4)[0]
            .sum(axis=2)
        )
    else:
        img = (
            np.asarray(fb)
            .reshape(n_tiles, n_pix_local, n_chunks, 4)
            .sum(axis=2)
        )
    return img.reshape(height, width, 4)


def render_sharded_host(scene, params, cfg, width, height, spp, spp_base, mesh: Mesh, **kw):
    """Host-stepped multi-device render: the wavefront state is sharded row-wise
    over the mesh's 'tiles' axis and every phase program runs SPMD (scene
    replicated, zero cross-device traffic during tracing — the TPU-native
    analogue of the reference's single big dispatch, SURVEY 2c). Sample set
    identical to a single-device render."""
    from jax.sharding import NamedSharding

    from ..ops import megakernel as M

    n_tiles = int(np.prod(list(mesh.shape.values())))
    assert height % n_tiles == 0, f"height {height} not divisible by {n_tiles} devices"
    axes = tuple(mesh.axis_names)

    lane_spec = P(axes)  # lane axis sharded over all mesh axes
    state = M.init_state(width, height)
    shard = NamedSharding(mesh, lane_spec)
    shard2 = NamedSharding(mesh, P(axes, None))
    state = {
        k: jax.device_put(v, shard2 if v.ndim == 2 else shard)
        for k, v in state.items()
    }
    repl = NamedSharding(mesh, P())
    scene = jax.device_put(scene, repl)
    params = jax.device_put(params, repl)

    spp = jnp.asarray(spp, jnp.int32)
    spp_base = jnp.asarray(spp_base, jnp.int32)
    k_march = kw.get("k_march") or (
        M.DEFAULT_K_MARCH if jax.default_backend() == "tpu" else 4
    )
    check_every = kw.get("check_every", 16)
    test_every = kw.get("test_every", M.DEFAULT_TEST_EVERY)
    while True:
        for i in range(check_every):
            state = M.phase_regen(state, scene, params, cfg, width, spp, spp_base, height)
            state = M.phase_march(state, scene, params, cfg, k_march, test_every)
            state = M.phase_nee(state, scene, params, cfg)
            if i == check_every - 1:
                # activity as a vector output of the finish program itself —
                # a separate scalar-reduction program stalls the pipeline
                # (see megakernel._phase_finish_act_sub)
                state, n_active = M.phase_finish_act(state, scene, params, cfg)
            else:
                state = M.phase_finish(state, scene, params, cfg)
        if int(np.asarray(n_active)[0]) == 0:
            break
    return state["accum"].reshape(height, width, 4)


def render_sharded_pallas(scene, params, cfg, width, height, spp, spp_base,
                          mesh: Mesh, seed=None, **pallas_kw):
    """The Pallas megakernel engine across ``mesh``: pixel-band data
    parallelism. Each device runs the WHOLE in-kernel work-queue drain
    (ops/pallas/kernel.py) for its contiguous flat-pixel band — the
    kernel is tile-local by construction (scene tables replicated, zero
    collectives during tracing), so the only cross-device op is the
    shard_map output concat. Sample set identical to the single-device
    pallas engine: lane->(pixel, sample) TEA streams depend only on the
    absolute flat pixel index, which each shard offsets via PI_PIX0.

    Matches the reference's one-dispatch-per-frame scaling story
    (shader/pathtracer_brick.glsl:3) stretched over a TPU mesh
    (SURVEY 2c)."""
    import math

    from ..ops import pallas as PL
    from ..ops.pallas.kernel import _render_strips_jit
    from ..ops.pallas.pack import PI_PIX0, build_env_pool, build_params_rows

    from ..ops.pallas.pack import kernel_plan

    plan = kernel_plan(scene, cfg)
    if plan is None:
        raise NotImplementedError(
            "pallas engine does not support this scene (see "
            "ops.pallas.pack.kernel_plan); use step_engine='device_queue'")
    hbm = plan == "hbm"
    n_dev = int(np.prod(list(mesh.shape.values())))
    axes = tuple(mesh.axis_names)
    n_pix = width * height
    n_pad = -(-n_pix // (1024 * n_dev)) * (1024 * n_dev)
    per_dev = n_pad // n_dev
    qi = 1024 * math.gcd(per_dev // 1024, 64)

    packed = PL.pack_scene(scene, use_tf=cfg.use_tf,
                           use_emission=cfg.has_emission)
    if seed is None:
        seed = int(np.asarray(params.seed))
    pool = build_env_pool(scene, seed, int(spp_base))
    pf, pi0 = build_params_rows(scene, params, width, height, spp_base)
    pi_all = jnp.concatenate(
        [pi0.at[0, PI_PIX0].set(d * per_dev) for d in range(n_dev)], axis=0)

    tabs = {k: v for k, v in packed._asdict().items() if k != "meta"}
    if cfg.use_tf:
        # pre-baked TF majorant table (see renderer._render_pallas)
        from ..ops.transfer import tf_alpha_majorant

        raw = packed.mip_maj
        d_norm = params.density_scale * raw * params.inv_majorant
        tabs["mip_maj"] = params.majorant * tf_alpha_majorant(
            scene.tf, d_norm.reshape(-1), onehot=False).reshape(raw.shape)
    meta = packed.meta
    interpret = jax.default_backend() != "tpu"
    repl = NamedSharding(mesh, P())
    tabs = jax.device_put(tabs, repl)
    pool = jax.device_put(pool, repl)
    pf = jax.device_put(pf, repl)
    pi_all = jax.device_put(pi_all, NamedSharding(mesh, P(axes, None)))

    kw = dict(test_every=2, unroll=2, escape_every=1, k_march=8,
              resolve_full=not (cfg.use_tf or cfg.has_emission),
              escape_full=False, nee_full=False, sublanes=8)
    kw.update(pallas_kw)
    if cfg.use_tf or cfg.has_emission or hbm:
        # full-lane resolve covers the VMEM no-TF kernel only (the HBM
        # atlas serves through the compacted DMA row-gather)
        kw["resolve_full"] = False

    def worker(tabs, pool, pf, pi):
        # env_rgbe=True matches the single-device engine's packed env
        # fetch (render_strips default) — the dryrun asserts BITWISE
        # equality between the two, which caught this defaulting to the
        # unpacked 3-table fetch in round 5
        img, _iters = _render_strips_jit(
            tabs, pool, pf, pi, meta, int(width), per_dev // qi,
            int(spp), int(kw["k_march"]), int(kw["test_every"]),
            int(kw["unroll"]), int(kw["escape_every"]), True, qi,
            interpret, env_rgbe=True,
            resolve_full=bool(kw["resolve_full"]),
            escape_full=bool(kw["escape_full"]),
            nee_full=bool(kw["nee_full"]),
            sublanes=int(kw["sublanes"]), hbm_atlas=hbm,
            pool_rgbe=True)
        return img

    out = jax.shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P(), P(axes, None)),
        out_specs=P(axes, None),
        # pallas_call's out_shape carries no vma annotation; the output
        # is trivially per-shard (pixel bands), so skip the vma check
        check_vma=False,
    )(tabs, pool, pf, pi_all)
    return out[:n_pix].reshape(height, width, 4)

"""Work-queue wavefront engine: lanes dequeue (pixel, sample-chunk) items.

The fixed lane=pixel mapping of ops/megakernel.py leaves almost every lane
idle for most of a render: measured on the smoke scene (128^2, 4 spp, 100
bounces) the mean active-lane fraction across the drain is 2.5% — sky
pixels finish in a handful of wavefront steps while dense-interior
stragglers march for hundreds, and the whole N-lane array keeps stepping
until the last lane drains. The reference gets load balancing for free
from SIMT hardware (retired warps yield their SM slots to fresh ones,
shader/pathtracer_brick.glsl:3, src/renderer.cpp:137-140); an XLA program
with static shapes has to build it.

This engine runs a small persistent lane array (L ~ n_pixels/8) over a
work queue of items = (pixel, sample-chunk). When a lane finishes its item
it flushes its per-item accumulator into an (n_items, 4) buffer with a
unique-index scatter and claims the next item (exclusive cumsum over
finishing lanes + a carried cursor — the XLA analogue of the global
work-stealing counter in persistent-threads GPU renderers). Per-(pixel,
sample) TEA seeding (megakernel.phase_regen_body, pathtracer_brick.glsl:28)
makes the result independent of WHICH lane runs an item and WHEN:

 - csize == spp (one chunk per pixel, the default): a pixel's samples run
   sequentially on one lane in sample order — the image is IDENTICAL to
   the fixed-lane engines (same per-lane streams, same per-pixel sum
   order; exact in eager semantics, and bitwise up to the ~1-ULP fp
   -contraction wiggle jit already shows between program shapes of the
   stock engine).
 - csize < spp: chunks of one pixel run on different lanes; per-chunk sums
   are exact and the final per-pixel reduction runs in fixed chunk order —
   deterministic for a given (spp, csize), ULP-different from the fixed
   -lane engines' single-sequence sums. Stragglers shrink from
   spp x steps(pixel) to csize x steps(pixel), which bounds the drain
   tail for large spp.

Items interleave sample-minor (item = pixel * n_chunks + chunk) so one
straggler pixel's chunks dequeue at nearly the same time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .megakernel import (
    DEFAULT_TEST_EVERY,
    MODE_INACTIVE,
    MODE_REGEN,
    _default_k_march,
    _default_unroll,
    safety_steps,
    step_body,
)


def init_queue_state(lanes: int):
    """Fresh lane state for an L-lane work-queue array. px/py are assigned
    at dequeue; spp_lane starts 0 so every lane claims an item on the first
    dequeue. Build eagerly and pass as an argument (in-jit iota literals
    degrade this runtime, see megakernel.init_state)."""
    from .megakernel import init_state

    s = init_state(lanes, 1)
    s["item"] = jnp.full((lanes,), -1, jnp.int32)
    s["spp_lane"] = jnp.zeros((lanes,), jnp.int32)
    s["sppb_lane"] = jnp.zeros((lanes,), jnp.int32)
    return s


def dequeue_body(s, fb, cursor, n_chunks, csize, spp, spp_base, width, row0,
                 col0=0):
    """Flush finished items and claim new ones.

    fb: (n_items, 4) per-item accumulation buffer. cursor: (8,) i32 queue
    head (vector-widened: scalar program outputs hit this runtime's slow
    path, see megakernel._phase_finish_act_sub). ``width`` is the TILE
    width (static, shapes the item space); (col0, row0) place the tile in
    the full frame and may be traced. Returns (s, fb, cursor).
    """
    i32 = jnp.int32
    n_items = fb.shape[0]
    s = dict(s)
    # INACTIVE lanes are claimants too: with gated dequeues (dequeue_every
    # > 1) a lane that finishes mid-window is flipped INACTIVE by regen
    # before the next dequeue sees it — it still holds an unflushed item
    need = (
        (s["mode"] == MODE_REGEN) | (s["mode"] == MODE_INACTIVE)
    ) & (s["spp_done"] >= s["spp_lane"])

    # flush: each item belongs to exactly one lane ever, so indices are
    # unique among flushing lanes; parked lanes aim at the OOB sentinel
    flush = need & (s["item"] >= 0)
    fb = fb.at[jnp.where(flush, s["item"], n_items)].add(s["accum"], mode="drop")

    rank = jnp.cumsum(need.astype(i32)) - need.astype(i32)  # exclusive
    new_item = cursor[0] + rank
    have = need & (new_item < n_items)
    item = jnp.where(have, new_item, jnp.where(need, -1, s["item"]))
    pix = item // n_chunks  # sample-minor interleave
    chunk = item % n_chunks
    s["item"] = item
    s["px"] = jnp.where(have, pix % width + col0, s["px"])
    s["py"] = jnp.where(have, pix // width + row0, s["py"])
    s["spp_lane"] = jnp.where(
        have, jnp.minimum(csize, spp - chunk * csize), s["spp_lane"]
    )
    s["sppb_lane"] = jnp.where(have, spp_base + chunk * csize, s["sppb_lane"])
    s["spp_done"] = jnp.where(have, 0, s["spp_done"])
    s["accum"] = jnp.where(have[..., None], 0.0, s["accum"])
    s["mode"] = jnp.where(
        have, MODE_REGEN, jnp.where(need & ~have, MODE_INACTIVE, s["mode"])
    )
    cursor = cursor + (need & have).sum(dtype=i32)
    return s, fb, cursor


def step_body_queue(s, fb, cursor, scene, params, cfg, width, full_height,
                    n_chunks, csize, spp, spp_base, k_march,
                    do_escape=True, test_every=None, do_nee=True, row0=0,
                    col0=0, full_width=None, do_dequeue=True):
    """One work-queue wavefront step: dequeue, then the standard
    regen -> march -> nee -> finish step with per-lane spp windows.

    do_dequeue=False skips the claim/flush machinery (its cumsum + item
    -buffer scatter are a measured ~40% of the full step cost at 16k
    lanes, probes/results/attrib.jsonl) — lanes that finish while it is
    off idle INACTIVE until the next dequeuing step, holding their
    unflushed accumulator (dequeue_body flushes INACTIVE claimants)."""
    full_width = width if full_width is None else full_width
    if do_dequeue:
        s, fb, cursor = dequeue_body(
            s, fb, cursor, n_chunks, csize, spp, spp_base, width, row0, col0
        )
    s = step_body(
        s, scene, params, cfg, full_width, s["spp_lane"], s["sppb_lane"],
        full_height, k_march, do_escape=do_escape, test_every=test_every,
        do_nee=do_nee,
    )
    return s, fb, cursor


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "width", "n_chunks", "csize", "spp",
        "k_march", "unroll", "test_every", "dequeue_every",
    ),
)
def _megastep_queue_jit(state, fb, cursor, scene, params, cfg, width,
                        full_height, n_chunks, csize, spp, spp_base,
                        k_march, unroll, test_every=DEFAULT_TEST_EVERY,
                        row0=0, col0=0, full_width=None, dequeue_every=1):
    n_items = fb.shape[0]
    for i in range(unroll):
        alt = (i % 2 == 1) or unroll == 1  # see megakernel._megastep_jit
        state, fb, cursor = step_body_queue(
            state, fb, cursor, scene, params, cfg, width, full_height,
            n_chunks, csize, spp, spp_base, k_march,
            do_escape=alt, test_every=test_every, do_nee=alt, row0=row0,
            col0=col0, full_width=full_width,
            do_dequeue=(i % dequeue_every == 0),
        )
    # activity = live lanes + unclaimed items (with gated dequeues every
    # lane can be INACTIVE while the queue still holds work)
    n_active = jnp.broadcast_to(
        (state["mode"] != MODE_INACTIVE).sum(dtype=jnp.int32)
        + (jnp.int32(n_items) - cursor[0]),
        (8,),
    )
    return state, fb, cursor, n_active


@partial(jax.jit, static_argnames=("cfg", "width", "n_chunks", "csize", "spp"))
def _queue_flush_jit(state, fb, cursor, cfg, width, n_chunks, csize, spp,
                     spp_base, row0, col0):
    """Final flush: one dequeue pass so items finished in the last gated
    window (held by INACTIVE lanes) land in the item buffer. cfg rides
    along only to keep jit cache keys aligned with the step programs."""
    state, fb, cursor = dequeue_body(
        state, fb, cursor, n_chunks, csize, spp, spp_base, width, row0, col0
    )
    return fb


def default_lanes(n_items: int) -> int:
    """L ~ n_items/8 keeps lanes ~fully busy (the measured idle integral of
    the fixed-lane engine is ~40x) while the queue still drains in ~8 lane
    -generations; floor keeps tiny frames on one wave."""
    lanes = max(2048, -(-n_items // 8 // 256) * 256)
    return min(-(-n_items // 128) * 128, lanes)


def render_wavefront_queue(
    scene,
    params,
    cfg,
    width,
    height,
    spp,
    spp_base,
    row0=0,
    full_height=None,
    lanes=None,
    csize=None,
    k_march=None,
    unroll=None,
    check_every=2,
    test_every=DEFAULT_TEST_EVERY,
    col0=0,
    full_width=None,
    dequeue_every=1,
):
    """Work-queue render (module doc). Returns the (height, width, 4) SUM
    of spp per-sample (L, alpha) values for the tile at (col0, row0) of
    the full_width x full_height frame.

    spp and csize are compile-time constants here (the accumulation buffer
    is (n_pixels * spp/csize, 4)); progressive callers pass the same chunk
    size per trace() call so programs cache. Frame dims and tile offsets
    are dynamic — one compiled program per tile shape."""
    import numpy as _np

    full_height = height if full_height is None else full_height
    full_width = width if full_width is None else full_width
    if k_march is None:
        k_march = _default_k_march()
    if unroll is None:
        unroll = _default_unroll()
    spp = int(spp)
    csize = spp if csize is None else min(int(csize), spp)
    n_chunks = -(-spp // csize)
    n_pix = width * height
    n_items = n_pix * n_chunks
    if lanes is None:
        lanes = default_lanes(n_items)
    state = init_queue_state(lanes)
    fb = jnp.zeros((n_items, 4), jnp.float32)
    cursor = jnp.zeros((8,), jnp.int32)
    spp_base = jnp.asarray(spp_base, jnp.int32)
    row0 = jnp.asarray(row0, jnp.int32)
    col0 = jnp.asarray(col0, jnp.int32)
    fw = jnp.asarray(full_width, jnp.int32)
    fh = jnp.asarray(full_height, jnp.int32)

    # safety bound: ~items-per-lane generations of the per-chunk step bound
    max_steps = safety_steps(csize, params.bounces) * (n_items // lanes + 2)
    steps = 0
    while True:
        for _ in range(check_every):
            state, fb, cursor, n_active = _megastep_queue_jit(
                state, fb, cursor, scene, params, cfg, width, fh,
                n_chunks, csize, spp, spp_base, k_march, unroll,
                test_every, row0, col0, fw, dequeue_every,
            )
        steps += check_every * unroll
        stuck = int(_np.asarray(n_active)[0])
        if stuck == 0:
            break
        if steps > max_steps:
            raise RuntimeError(
                f"queue render did not converge after {steps} steps "
                f"({stuck} lanes active, cursor {int(_np.asarray(cursor)[0])}"
                f"/{n_items})"
            )
    if dequeue_every > 1:
        fb = _queue_flush_jit(
            state, fb, cursor, cfg, width, n_chunks, csize, spp, spp_base,
            row0, col0,
        )
    img = fb.reshape(n_pix, n_chunks, 4).sum(axis=1)  # fixed chunk order
    return img.reshape(height, width, 4)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "width", "n_chunks", "csize", "spp", "k_march", "unroll",
        "test_every", "dequeue_every", "nee_every", "pack_carry",
    ),
)
def _queue_device_jit(state, fb, cursor, scene, params, cfg, width,
                      full_height, n_chunks, csize, spp, spp_base, k_march,
                      unroll, test_every, row0, col0, full_width,
                      dequeue_every=None, nee_every=2, pack_carry=True):
    """The whole queue render as ONE program: lax.while_loop until every
    item is claimed and every lane drained. Zero host syncs mid-render —
    the measured per-megastep fixed cost (~33 ms/call through the tunnel)
    and per-group activity pull (~25 ms) vanish; the loop cond runs on
    device. ``unroll`` steps run per cond check (inactive lanes no-op, so
    overshoot past drain is harmless and sample streams stay identical).

    Dequeues run once per while-iteration (dequeue_every=unroll): the
    claim cumsum + item-buffer scatter are ~40% of the full step at 16k
    lanes (probes/results/attrib.jsonl) and a finished lane idles at most
    unroll-1 steps of an item that lives for tens-to-hundreds."""
    import jax.lax as lax

    if dequeue_every is None:
        dequeue_every = unroll
    n_items = fb.shape[0]
    lanes = state["mode"].shape[0]
    max_iters = (
        (jnp.int32(4096) + jnp.int32(512) * jnp.int32(csize))
        * (jnp.maximum(params.bounces, 32) // 32 + 1)
        * jnp.int32(n_items // lanes + 2)
    )

    from .megakernel import pack_state, unpack_state

    def steps(s, fb_, cur):
        for i in range(unroll):
            # NEE/escape resolution every nee_every-th step (default every
            # other — see _megastep_queue_jit): pure scheduling, per-lane
            # draw order is unchanged (parked lanes just wait longer)
            alt = (i % nee_every == nee_every - 1) or unroll == 1
            s, fb_, cur = step_body_queue(
                s, fb_, cur, scene, params, cfg, width, full_height,
                n_chunks, csize, spp, spp_base, k_march,
                do_escape=alt, test_every=test_every, do_nee=alt, row0=row0,
                col0=col0, full_width=full_width,
                do_dequeue=(i % dequeue_every == 0),
            )
        return s, fb_, cur

    if pack_carry:
        # carry the lane state as 2 wide buffers instead of ~25 leaves:
        # the runtime pays ~0.1 ms per carried buffer per step
        # (probes/results/floor.jsonl; see megakernel.pack_state)
        template = state
        F0, I0 = pack_state(state)

        def cond(c):
            F, I, fb_, cur, it = c
            s = unpack_state(F, I, template)  # unused slices DCE away
            live = (s["mode"] != MODE_INACTIVE).any() | (cur[0] < n_items)
            return live & (it < max_iters)

        def body(c):
            F, I, fb_, cur, it = c
            s, fb_, cur = steps(unpack_state(F, I, template), fb_, cur)
            F, I = pack_state(s)
            return F, I, fb_, cur, it + unroll

        F, I, fb, cursor, it = lax.while_loop(
            cond, body, (F0, I0, fb, cursor, jnp.int32(0))
        )
        state = unpack_state(F, I, template)
    else:
        def cond(c):
            s, fb_, cur, it = c
            live = (s["mode"] != MODE_INACTIVE).any() | (cur[0] < n_items)
            return live & (it < max_iters)

        def body(c):
            s, fb_, cur, it = c
            s, fb_, cur = steps(s, fb_, cur)
            return s, fb_, cur, it + unroll

        state, fb, cursor, it = lax.while_loop(
            cond, body, (state, fb, cursor, jnp.int32(0))
        )
    # final flush: items finished inside the last gated window are still
    # held by INACTIVE lanes
    state, fb, cursor = dequeue_body(
        state, fb, cursor, n_chunks, csize, spp, spp_base, width, row0, col0
    )
    return fb, jnp.broadcast_to(it, (8,))


def render_wavefront_queue_device(
    scene,
    params,
    cfg,
    width,
    height,
    spp,
    spp_base,
    row0=0,
    full_height=None,
    lanes=None,
    csize=None,
    k_march=None,
    unroll=4,
    test_every=None,
    col0=0,
    full_width=None,
    return_steps=False,
    dequeue_every=None,
    nee_every=2,
    pack_carry=True,
):
    """Work-queue render as a single device dispatch (persistent-threads
    analogue of the reference's one dispatch_compute per spp,
    src/renderer.cpp:137-140 — here one dispatch per ``spp`` samples).
    Same item/claim semantics and per-(pixel, sample) seeds as
    render_wavefront_queue, so the image matches the host-stepped queue
    engine; only the stepping loop moves on-device.

    return_steps=True returns (image, wavefront step count) for cost
    attribution probes."""
    full_height = height if full_height is None else full_height
    full_width = width if full_width is None else full_width
    if k_march is None:
        k_march = _default_k_march()
    spp = int(spp)
    csize = spp if csize is None else min(int(csize), spp)
    n_chunks = -(-spp // csize)
    n_pix = width * height
    n_items = n_pix * n_chunks
    if lanes is None:
        # much smaller than the host engine's default: with zero per-step
        # dispatch cost, per-step cost ~ a + b*L while queue work is
        # L-independent — measured optimum n_items/128 at 256^2 (29.4 vs
        # 15.9 spp/s at /32), flat across 8k-32k at 1024^2 (work-bound)
        lanes = min(32768, max(4096, -(-n_items // 128 // 128) * 128))
        lanes = min(-(-n_items // 128) * 128, lanes)
    if test_every is None:
        # post-gating sweep (probes/results/gate2/gate3.jsonl): te=4 wins
        # at every lane count once dequeues are gated (1024²/L=16k: 4.2 vs
        # 3.87 spp/s; 256²/L=4k: 56 vs 52) — fewer resolve phases per step
        # beats shorter parking now that the queue tax is off the steps.
        test_every = 4
    state = init_queue_state(lanes)
    fb = jnp.zeros((n_items, 4), jnp.float32)
    cursor = jnp.zeros((8,), jnp.int32)
    fb, it = _queue_device_jit(
        state, fb, cursor, scene, params, cfg, width,
        jnp.asarray(full_height, jnp.int32), n_chunks, csize, spp,
        jnp.asarray(spp_base, jnp.int32), k_march, int(unroll), test_every,
        jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32),
        jnp.asarray(full_width, jnp.int32), dequeue_every, nee_every,
        pack_carry,
    )
    img = fb.reshape(n_pix, n_chunks, 4).sum(axis=1)  # fixed chunk order
    img = img.reshape(height, width, 4)
    return (img, it[0]) if return_steps else img


def render_wavefront_queue_tiled(
    scene,
    params,
    cfg,
    width,
    height,
    spp,
    spp_base,
    tile_rows=256,
    tile_cols=None,
    **kwargs,
):
    """Tile-block driver over render_wavefront_queue (same contract as
    megakernel.render_wavefront_tiled): one compiled queue program per
    tile shape shared across frame resolutions, per-tile early drain, and
    a bounded (n_tile_pixels * n_chunks, 4) item buffer instead of a
    full-frame one (128 MB at 1024^2 x 8 chunks untiled).

    device=True dispatches each tile as a single on-device while_loop
    (render_wavefront_queue_device) instead of the host-stepped loop."""
    inner = (
        render_wavefront_queue_device
        if kwargs.pop("device", False)
        else render_wavefront_queue
    )
    if inner is render_wavefront_queue_device:
        kwargs.pop("check_every", None)
    if tile_cols is None:
        tile_cols = tile_rows
    if (
        height % tile_rows != 0
        or width % tile_cols != 0
        or (height == tile_rows and width == tile_cols)
    ):
        return inner(
            scene, params, cfg, width, height, spp, spp_base, **kwargs
        )
    rows = [
        jnp.concatenate(
            [
                inner(
                    scene,
                    params,
                    cfg,
                    tile_cols,
                    tile_rows,
                    spp,
                    spp_base,
                    row0=r0,
                    col0=c0,
                    full_height=height,
                    full_width=width,
                    **kwargs,
                )
                for c0 in range(0, width, tile_cols)
            ],
            axis=1,
        )
        for r0 in range(0, height, tile_rows)
    ]
    return jnp.concatenate(rows, axis=0)

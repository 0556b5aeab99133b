"""Lane compaction: run a gather-heavy stage on only the lanes that need it.

Random gathers on this runtime cost per INDEX (scalarized, ~10 ns each at
wavefront scale) while row width is nearly free (ops/envmap.py alias-row
measurement), so a stage that fetches for all N lanes but masks most of
them wastes most of its cost. ``compact_apply`` services the K
highest-priority lanes instead: ONE packed row gather in, the stage body
on (K, ...) shapes, ONE packed row scatter out — 3 K-index ops replacing
each N-index op of the stage.

Deferred-service semantics make the budget SAFE: a masked lane beyond the
K budget is simply not serviced this call; callers leave its pending event
in place and it is picked up by a later call (highest-priority-first).
Per-lane RNG streams (ops/rng.py) mean a deferred lane consumes exactly
the same draws whenever it is serviced, so the FINAL image is bit-identical
for every budget — only the step count to drain changes.

This is the TPU analogue of classic GPU wavefront compaction (persistent
threads); the reference gets it for free from SIMT hardware scheduling
(one GL thread per pixel, shader/pathtracer_brick.glsl:3).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .gather import vgather, vscatter_rows


def pack_cols(*cols):
    """Stack scalar/vector f32 (or bitcast-able int) columns into (N, W)
    rows. Integer columns ride bitcast so packing is exact."""
    parts = []
    for c in cols:
        if jnp.issubdtype(c.dtype, jnp.integer):
            c = lax.bitcast_convert_type(c, jnp.float32)
        elif c.dtype == jnp.bool_:
            c = c.astype(jnp.float32)
        if c.ndim == 1:
            c = c[:, None]
        parts.append(c)
    return jnp.concatenate(parts, axis=-1)


def col_u32(rows, i):
    """Bitcast column i back to uint32 (for packed RNG seeds)."""
    return lax.bitcast_convert_type(rows[..., i], jnp.uint32)


def budget(n, divisor):
    """Static service budget for an n-lane array: n/divisor rounded up to
    a 128-lane multiple. Returns 0 (= run full-domain) when compaction is
    off or would not shrink the work."""
    if not divisor or divisor <= 1:
        return 0
    k = max(128, -(-(n // divisor) // 128) * 128)
    return 0 if k >= n else k


def _select_topk(mask, k):
    """Exact top-k selection (all masked lanes serviced while count <= k).
    lax.top_k over the full lane array lowers through a sort network —
    measured as a per-stage cost candidate; kept for A/B against the
    blocked selector."""
    _, sel = lax.top_k(mask.astype(jnp.int32), k)
    return sel, None


def _select_block(mask, k):
    """Sort-free selector: lane i belongs to block i % k; each block
    services its first masked lane (a pure argmax reduction over the
    (b, k) strided view — no sort, no n-length scatter).

    The stride spreads spatially-clustered events (adjacent pixels park
    together in dense regions; lanes are pixel-row-major) across distinct
    blocks, so a cluster of size <= k drains in one call just like top_k.
    A block with multiple masked lanes defers the rest — same deferral
    semantics, identical final image. Returns (sel, picked): un-picked
    slots carry an arbitrary UNMASKED in-bounds lane (gather duplicates are
    harmless; the scatter side drops them via `picked`).
    """
    n = mask.shape[0]
    b = -(-n // k)
    pad = b * k - n
    mask_p = jnp.concatenate([mask, jnp.zeros((pad,), bool)]) if pad else mask
    mask_bk = mask_p.reshape(b, k)
    picked = mask_bk.any(axis=0)
    arg = jnp.argmax(mask_bk, axis=0)  # first masked lane of each block
    # picked slots: sel = arg*k + j < n (padded tail is all-False, so a
    # pick never lands there); un-picked slots clamp to n-1 (may duplicate)
    sel = jnp.minimum(arg * k + jnp.arange(k, dtype=arg.dtype), n - 1)
    return sel, picked


def compact_apply(mask, inputs, fn, k, selector="block"):
    """Service up to k ``mask`` lanes with ``fn``.

    mask:   (N,) bool — lanes that want service.
    inputs: (N, Win) f32 rows (pack_cols).
    fn:     (k, Win) rows, (k,) bool mask -> (k, Wout) rows. Drawing RNG
            inside fn is fine as long as the seed rides in the rows and is
            drawn masked — per-lane streams keep deferral bit-exact.
    k:      static service budget (rows per call).
    selector: "block" (sort-free, default) or "topk" (exact priority).

    Returns (N, Wout) rows: fn's outputs on serviced lanes, ZERO elsewhere
    — callers detect service through a flag column fn sets from its mask
    argument (zero on un-serviced lanes by construction).
    """
    n = mask.shape[0]
    sel, picked = (_select_block if selector == "block" else _select_topk)(mask, k)
    # the mask rides in the gathered row (row width is nearly free, an
    # extra k-index gather op is not)
    rows_in = vgather(jnp.concatenate([inputs, mask[:, None].astype(jnp.float32)], -1), sel)
    mask_c = rows_in[..., -1] > 0.0
    if picked is not None:
        mask_c = mask_c & picked
    rows_out = fn(rows_in[..., :-1], mask_c)
    if picked is None:
        base = jnp.zeros((n, rows_out.shape[-1]), jnp.float32)
        return vscatter_rows(base, sel, rows_out)
    # un-picked slots must not land on real lanes: route each to its own
    # padding row past n (unique AND in-bounds in an (n+k)-row base, so the
    # scatter keeps the same fast promise_in_bounds/unique form as the topk
    # path — no "drop" mode), then slice the padding off. Must be a
    # scatter-SET, not add: rows carry bitcast u32 seeds whose float
    # patterns are denormal, and 0.0 + x flushes them to zero under FTZ.
    sel_s = jnp.where(mask_c, sel, n + jnp.arange(k, dtype=sel.dtype))
    base = jnp.zeros((n + k, rows_out.shape[-1]), jnp.float32)
    return vscatter_rows(base, sel_s, rows_out)[:n]

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


def compact_apply(mask, inputs, fn, k):
    """Service the k highest-priority ``mask`` lanes with ``fn``.

    mask:   (N,) bool — lanes that want service.
    inputs: (N, Win) f32 rows (pack_cols).
    fn:     (k, Win) rows, (k,) bool mask -> (k, Wout) rows. Drawing RNG
            inside fn is fine as long as the seed rides in the rows and is
            drawn masked — per-lane streams keep deferral bit-exact.
    k:      static service budget (rows per call).

    Returns (N, Wout) rows: fn's outputs on serviced lanes, ZERO elsewhere
    — callers detect service through a flag column fn sets from its mask
    argument (zero on un-serviced lanes by construction).
    """
    n = mask.shape[0]
    # deterministic highest-priority-first selection; ties by lane index
    _, sel = lax.top_k(mask.astype(jnp.int32), k)
    # the mask rides in the gathered row (row width is nearly free, an
    # extra k-index gather op is not)
    rows_in = vgather(jnp.concatenate([inputs, mask[:, None].astype(jnp.float32)], -1), sel)
    mask_c = rows_in[..., -1] > 0.0
    rows_out = fn(rows_in[..., :-1], mask_c)
    base = jnp.zeros((n, rows_out.shape[-1]), jnp.float32)
    return vscatter_rows(base, sel, rows_out)

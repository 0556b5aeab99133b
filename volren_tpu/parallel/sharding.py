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

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.megakernel import render_wavefront_tile


def make_mesh(n_tiles: int | None = None, n_spp: int = 1, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n_tiles is None:
        n_tiles = n // n_spp
    assert n_tiles * n_spp == n, f"{n_tiles}x{n_spp} mesh != {n} devices"
    import numpy as np

    return Mesh(np.asarray(devices).reshape(n_tiles, n_spp), ("tiles", "spp"))


def render_sharded(scene, params, cfg, width, height, spp, spp_base, mesh: Mesh):
    """Render a full frame across ``mesh``; returns the (H, W, 4) sample SUM
    (same contract as ops.megakernel.render_wavefront)."""
    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    assert height % n_tiles == 0, f"height {height} not divisible by {n_tiles} tiles"
    assert spp % n_spp == 0, f"spp {spp} not divisible by {n_spp} spp shards"
    local_h = height // n_tiles
    local_spp = spp // n_spp

    def shard_fn(scene, params, spp_base_arr):
        ti = lax.axis_index("tiles")
        si = lax.axis_index("spp")
        row0 = (ti * local_h).astype(jnp.int32)
        base = spp_base_arr + si.astype(jnp.int32) * jnp.int32(local_spp)
        acc, _it = render_wavefront_tile(
            scene,
            params,
            cfg,
            width,
            local_h,
            jnp.int32(local_spp),
            base,
            row0,
            full_height=height,
        )
        return lax.psum(acc, "spp")

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=P("tiles", None, None),
            check_vma=False,
        )
    )
    return fn(scene, params, jnp.asarray(spp_base, jnp.int32))

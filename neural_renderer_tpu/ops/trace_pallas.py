"""Pallas dense ray-mesh intersection kernel.

The TPU traversal story (ops/traversal.py) picks dense all-pairs testing for
small-to-medium meshes because XLA gather throughput makes pointer-chasing
BVH walks uncompetitive. This kernel is the speed-of-light version of that
dense path: the whole packed triangle array (9 rows x T, T <= ~16k) lives in
VMEM for every grid step, each block of 512 rays sweeps it in 128-triangle
register tiles on the VPU, and nothing but the final [2, N] best-hit record
ever touches HBM. The XLA fallback (_trace_dense) computes identical math
and serves as the oracle + CPU path.

Output packing: row 0 = best_t (1e30 on miss), row 1 = best triangle index
bitcast to f32 (one output block, one store).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_RAYS = 512
# 512-wide triangle tiles: the round-5 kernel ablation
# (scripts/ablate_trace_kernel.py) measured 24.6 ps/pair at width 512 vs
# 37.1 at the original 128 (bit-exact, same tie-break) — fewer tile-loop
# iterations and fewer accumulator read-modify-write passes per pair. Width
# 1024 fails to compile (Mosaic). Callers pad triangle arrays to TRI_TILE
# multiples, so the constant propagates everywhere.
TRI_TILE = 512
# The dual-mesh sweep kernel carries FIVE per-lane accumulators (strict
# fwd2 pair + backward + inner pair) where the trace kernel carries two; at
# width 512 its scoped-VMEM stack hits 16.74 MB vs the 16 MB limit on SOME
# shapes (compile-dependent — the 2.07M-ray bench shapes fit, the 2048-ray
# test shapes did not). Width 256 keeps the measured tile-width win (+21%
# over 128 in the ablation) with ~2.6 MB of accumulators.
SWEEP_TRI_TILE = 256
MIN_T = 1e-6
TRI_EPSILON = 1e-8


def _kernel(mask_ref, o_ref, d_ref, tri_ref, out_ref, *, mode: int,
            num_tiles: int):
    """mask_ref (scalar prefetch): per-block skip flags — 0 means every ray
    in the block is known to miss (AABB prefilter / inactive); the block
    writes misses without touching a triangle tile."""
    i = pl.program_id(0)

    @pl.when(mask_ref[i] == 0)
    def _dead():
        out_ref[0, :] = jnp.full((BLOCK_RAYS,), 1e30, jnp.float32)
        out_ref[1, :] = jax.lax.bitcast_convert_type(
            jnp.zeros((BLOCK_RAYS,), jnp.int32), jnp.float32)

    @pl.when(mask_ref[i] != 0)
    def _live():
        _trace_block_body(o_ref, d_ref, tri_ref, out_ref, mode=mode,
                          num_tiles=num_tiles)


def _trace_block_body(o_ref, d_ref, tri_ref, out_ref, *, mode: int,
                      num_tiles: int):
    # PER-LANE best (t, tri) folded across tiles; the cross-lane argmin runs
    # ONCE per block (was: one min + one iota-argmin cascade per tile).
    # Ties resolve to the smallest triangle index, exactly like the old
    # per-tile formulation: strict `<` keeps the earliest tile per lane, and
    # the final min-over-lanes picks the smallest id among equal-t lanes.
    big = jnp.full((BLOCK_RAYS, TRI_TILE), 1e30, jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_RAYS, TRI_TILE), 1)

    def tile(c, state):
        bt, btri = state
        t, det = _mt_tile_t(o_ref, d_ref,
                            tri_ref[:, pl.ds(c * TRI_TILE, TRI_TILE)])
        if mode == 1:    # FORWARD_ONLY: facing < 0 == det > 0 (_mt_tile_t)
            t = jnp.where(det > 0.0, t, 1e30)
        elif mode == 2:  # BACKWARD_ONLY
            t = jnp.where(det < 0.0, t, 1e30)
        better = t < bt
        btri = jnp.where(better, c * TRI_TILE + lane, btri)
        bt = jnp.where(better, t, bt)
        return bt, btri

    bt, btri = jax.lax.fori_loop(0, num_tiles, tile,
                                 (big, jnp.zeros_like(lane)))
    best_t = jnp.min(bt, axis=1)
    best_tri = jnp.min(jnp.where(bt <= best_t[:, None], btri,
                                 jnp.int32(2147483647)), axis=1)
    out_ref[0, :] = best_t
    out_ref[1, :] = jax.lax.bitcast_convert_type(best_tri, jnp.float32)


def _sweep_kernel(mask_ref, o_ref, d_ref, tri_ref, out_ref, *,
                  num_outer_tiles: int, num_tiles: int, with_fwd2: bool,
                  mxu: bool = False):
    """Dual-mesh dual-facing sweep: tris_packed = [outer | inner] (each padded
    to SWEEP_TRI_TILE). Emits per-ray nearest FORWARD and BACKWARD hit t for each
    mesh in one pass, plus the SECOND-nearest outer forward t — out rows =
    (outer_fwd, outer_bwd, inner_fwd, inner_bwd, outer_fwd2), 1e30 on miss.
    One sweep replaces up to five separate trace_mesh launches in the shell
    march / early-termination stage (traceSegmentExitsKernel +
    checkBounceEarlyTerminationKernel + traceOuterShellEntryFromRaysKernel
    semantics, cuda_renderer_neural.cu:858-930, 503-553, 773-852); exact
    because an ANY-mode closest hit equals min(forward closest, backward
    closest). outer_fwd2 lets the camera path derive the march's first
    re-entry without a second launch (crossings alternate on a closed
    surface).

    mask_ref (scalar prefetch): per-block activity/AABB-prefilter flags — a
    block whose rays all miss the shells' (padded) union AABB, or carry no
    active ray, writes misses without sweeping a single triangle tile."""
    i = pl.program_id(0)

    @pl.when(mask_ref[i] == 0)
    def _dead():
        miss = jnp.full((BLOCK_RAYS,), 1e30, jnp.float32)
        for r in range(5 if with_fwd2 else 4):
            out_ref[r, :] = miss

    @pl.when(mask_ref[i] != 0)
    def _live():
        _sweep_block_body(o_ref, d_ref, tri_ref, out_ref,
                          num_outer_tiles=num_outer_tiles,
                          num_tiles=num_tiles, with_fwd2=with_fwd2, mxu=mxu)


def _mt_tile_t(o_ref, d_ref, tb):
    """Möller-Trumbore of a ray block against one triangle tile: returns
    (t, det) with t = 1e30 where the pair is rejected (det cull, barycentric
    bounds, epsilon). Facing is NOT applied — det's sign carries it:
    det = e1.(d x e2) = -dot(geometric normal, d), so FORWARD (facing < 0)
    == det > 0. Same det arithmetic as the XLA twin (_mt_from_packed)."""
    ox = o_ref[0, :][:, None]
    oy = o_ref[1, :][:, None]
    oz = o_ref[2, :][:, None]
    dx = d_ref[0, :][:, None]
    dy = d_ref[1, :][:, None]
    dz = d_ref[2, :][:, None]
    v0x = tb[0, :][None, :]
    v0y = tb[1, :][None, :]
    v0z = tb[2, :][None, :]
    e1x = tb[3, :][None, :]
    e1y = tb[4, :][None, :]
    e1z = tb[5, :][None, :]
    e2x = tb[6, :][None, :]
    e2y = tb[7, :][None, :]
    e2z = tb[8, :][None, :]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) >= TRI_EPSILON
    inv_det = 1.0 / jnp.where(ok, det, 1.0)

    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)

    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)

    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok &= (t > TRI_EPSILON) & (t > MIN_T)
    return jnp.where(ok, t, 1e30), det


def _strict_pair_update(m1, m2, tf):
    """Fold per-lane values tf into the per-lane strict two-min pair
    (m1, m2): m1 = running min, m2 = running min of values STRICTLY greater
    than m1 (equal-t duplicates collapse). The strict formulation is
    grouping-independent, so tile/lane/chunk partitions all agree bit-exactly
    with the XLA twin's chunk merge (traversal._dense_t_only)."""
    n1 = jnp.minimum(m1, tf)
    m2 = jnp.minimum(jnp.where(m1 > n1, m1, m2),
                     jnp.where(tf > n1, tf, 1e30))
    return n1, m2


def _lane_min(x):
    return jnp.min(x, axis=1)


def _lane_pair_reduce(m1, m2):
    """Per-lane strict pairs [R, L] -> per-ray strict pair ([R], [R])."""
    g1 = jnp.min(m1, axis=1)
    g2 = jnp.min(jnp.where(m1 > g1[:, None], m1, m2), axis=1)
    return g1, g2


def _sweep_block_body(o_ref, d_ref, tri_ref, out_ref, *,
                      num_outer_tiles: int, num_tiles: int, with_fwd2: bool,
                      mxu: bool):
    if mxu:
        from .trace_mxu import pair_eval_raw, ray_features
        F = ray_features(o_ref[:, :], d_ref[:, :])

        def tile(c, state):
            of, ob, inf_, inb, of2 = state
            tb = tri_ref[:, pl.ds(c * SWEEP_TRI_TILE, SWEEP_TRI_TILE)]
            # Matmul pair math (ops/trace_mxu.py); facing = -det.
            t, ok, det = pair_eval_raw(F, tb)
            valid = ok & (t > MIN_T)
            tf = jnp.where(valid & (det > 0.0), t, 1e30)
            t_fwd = jnp.min(tf, axis=1)
            t_bwd = jnp.min(jnp.where(valid & (det < 0.0), t, 1e30), axis=1)
            is_outer = c < num_outer_tiles
            if with_fwd2:
                t_fwd2 = jnp.min(jnp.where(tf > t_fwd[:, None], tf, 1e30),
                                 axis=1)
                n1 = jnp.minimum(of, t_fwd)
                new_of2 = jnp.minimum(jnp.where(of > n1, of, of2),
                                      jnp.where(t_fwd > n1, t_fwd, t_fwd2))
                of2 = jnp.where(is_outer, new_of2, of2)
            of = jnp.where(is_outer, jnp.minimum(of, t_fwd), of)
            ob = jnp.where(is_outer, jnp.minimum(ob, t_bwd), ob)
            inf_ = jnp.where(is_outer, inf_, jnp.minimum(inf_, t_fwd))
            inb = jnp.where(is_outer, inb, jnp.minimum(inb, t_bwd))
            return of, ob, inf_, inb, of2

        init = tuple(jnp.full((BLOCK_RAYS,), 1e30, jnp.float32)
                     for _ in range(5))
        of, ob, inf_, inb, of2 = jax.lax.fori_loop(0, num_tiles, tile, init)
        out_ref[0, :] = of
        out_ref[1, :] = ob
        out_ref[2, :] = inf_
        out_ref[3, :] = inb
        if with_fwd2:
            out_ref[4, :] = of2
        return

    # VPU path: PER-LANE accumulators folded across tiles, ONE cross-lane
    # reduction per block at the end — the per-tile lane reductions (3-4
    # log-width shuffle cascades per 128-triangle tile) were ~1/3 of the old
    # kernel's time. Outer and inner tiles run as separate static-range
    # loops so no per-tile is_outer selects are paid.
    big = jnp.full((BLOCK_RAYS, SWEEP_TRI_TILE), 1e30, jnp.float32)

    def outer_tile(c, state):
        m1f, m2f, m1b = state
        t, det = _mt_tile_t(o_ref, d_ref,
                            tri_ref[:, pl.ds(c * SWEEP_TRI_TILE,
                                             SWEEP_TRI_TILE)])
        tf = jnp.where(det > 0.0, t, 1e30)
        if with_fwd2:
            m1f, m2f = _strict_pair_update(m1f, m2f, tf)
        else:
            m1f = jnp.minimum(m1f, tf)
        m1b = jnp.minimum(m1b, jnp.where(det < 0.0, t, 1e30))
        return m1f, m2f, m1b

    def inner_tile(c, state):
        i1f, i1b = state
        t, det = _mt_tile_t(o_ref, d_ref,
                            tri_ref[:, pl.ds(c * SWEEP_TRI_TILE,
                                             SWEEP_TRI_TILE)])
        i1f = jnp.minimum(i1f, jnp.where(det > 0.0, t, 1e30))
        i1b = jnp.minimum(i1b, jnp.where(det < 0.0, t, 1e30))
        return i1f, i1b

    m1f, m2f, m1b = jax.lax.fori_loop(0, num_outer_tiles, outer_tile,
                                      (big, big, big))
    i1f, i1b = jax.lax.fori_loop(num_outer_tiles, num_tiles, inner_tile,
                                 (big, big))

    if with_fwd2:
        of, of2 = _lane_pair_reduce(m1f, m2f)
    else:
        of, of2 = _lane_min(m1f), None
    out_ref[0, :] = of
    out_ref[1, :] = _lane_min(m1b)
    out_ref[2, :] = _lane_min(i1f)
    out_ref[3, :] = _lane_min(i1b)
    if with_fwd2:
        out_ref[4, :] = of2


def sweep_shells_pallas(origins, dirs, tris_packed, num_outer_tiles: int,
                        num_tiles: int, with_fwd2: bool = False,
                        mxu: bool | None = None, interpret: bool = False,
                        block_mask=None):
    """origins/dirs [3, Npad]; tris_packed [9, num_tiles*SWEEP_TRI_TILE] =
    outer tris (num_outer_tiles tiles) then inner tris. Returns [5, Npad]:
    (outer_fwd_t, outer_bwd_t, inner_fwd_t, inner_bwd_t, outer_fwd2_t).

    block_mask ([Npad/BLOCK_RAYS] int32, optional): per-block skip flags —
    0 means every ray in the 512-ray block is known to miss (AABB prefilter
    or inactive); the block writes 1e30 without sweeping any tiles.

    mxu=None reads NR_TRACE_MXU here, outside the jit, so direct callers
    can flip the env var between calls; a call from inside another jitted
    program still pins the value at that program's trace time
    (process-level switch for bench A/Bs)."""
    import os as _os
    if mxu is None:
        mxu = _os.environ.get("NR_TRACE_MXU") == "1"
    if block_mask is None:
        block_mask = jnp.ones((origins.shape[1] // BLOCK_RAYS,), jnp.int32)
    return _sweep_shells_pallas(origins, dirs, tris_packed, block_mask,
                                num_outer_tiles, num_tiles, with_fwd2, mxu,
                                interpret)


@functools.partial(jax.jit, static_argnames=("num_outer_tiles", "num_tiles",
                                              "with_fwd2", "mxu",
                                              "interpret"))
def _sweep_shells_pallas(origins, dirs, tris_packed, block_mask,
                         num_outer_tiles: int, num_tiles: int,
                         with_fwd2: bool, mxu: bool,
                         interpret: bool = False):
    n = origins.shape[1]
    t_total = tris_packed.shape[1]
    grid = (n // BLOCK_RAYS,)

    rows = 5 if with_fwd2 else 4
    return pl.pallas_call(
        functools.partial(_sweep_kernel, num_outer_tiles=num_outer_tiles,
                          num_tiles=num_tiles, with_fwd2=with_fwd2,
                          mxu=mxu),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, BLOCK_RAYS), lambda i, m: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, BLOCK_RAYS), lambda i, m: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, t_total), lambda i, m: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, BLOCK_RAYS), lambda i, m: (0, i)),
        ),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(t_total) * 50,
            bytes_accessed=int(n) * 40 + 9 * int(t_total) * 4,
            transcendentals=0),
    )(block_mask, origins, dirs, tris_packed)


@functools.partial(jax.jit, static_argnames=("mode", "num_tiles",
                                              "interpret"))
def trace_dense_pallas(origins, dirs, tris_packed, mode: int, num_tiles: int,
                       interpret: bool = False, block_mask=None):
    """origins/dirs [3, Npad] (Npad multiple of BLOCK_RAYS); tris_packed
    [9, num_tiles*TRI_TILE]. Returns (best_t [Npad], best_tri [Npad]).
    block_mask: optional per-512-ray-block skip flags (see _kernel)."""
    n = origins.shape[1]
    t_total = tris_packed.shape[1]
    grid = (n // BLOCK_RAYS,)
    if block_mask is None:
        block_mask = jnp.ones((n // BLOCK_RAYS,), jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, mode=mode, num_tiles=num_tiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, BLOCK_RAYS), lambda i, m: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, BLOCK_RAYS), lambda i, m: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, t_total), lambda i, m: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2, BLOCK_RAYS), lambda i, m: (0, i)),
        ),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(t_total) * 45,
            bytes_accessed=int(n) * 32 + 9 * int(t_total) * 4,
            transcendentals=0),
    )(block_mask, origins, dirs, tris_packed)
    best_t = out[0]
    best_tri = jax.lax.bitcast_convert_type(out[1], jnp.int32)
    return best_t, best_tri

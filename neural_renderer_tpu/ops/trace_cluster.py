"""Two-level dense ray-mesh intersection for LARGE meshes.

The role OptiX GAS hardware traversal plays for arbitrary-size meshes in the
reference (/root/reference/src/mesh.cu:297-357, rt/optix_programs.cu:139-504),
rebuilt for the TPU's strengths: above DENSE_MAX_TRIANGLES the gather-driven
BVH walk is ~50x slower than dense VPU sweeps (BASELINE.md), so instead of
walking pointers we make the work dense at CLUSTER granularity:

  Level 0 (XLA): triangles sit in BVH-leaf order (mesh_bvh reorder), so
    consecutive CLUSTER_SIZE-triangle chunks are spatially tight; every ray
    slab-tests every cluster AABB (dense [N, C] vector math, C = T/256) and
    the hits are OR-reduced over 512-ray blocks into per-block worklists of
    cluster ids SORTED BY CONSERVATIVE ENTRY-T (front-to-back). Rays are
    octant+morton sorted first (traversal._ray_sort_order) so blocks form
    tight frusta with short worklists.

  Level 1 (Pallas streaming kernel): ONE grid step per ray block. The step
    DMAs its own worklist row (HBM -> SMEM scratch), then while-loops over
    exactly count_i clusters, DMA-ing each 256-triangle tile HBM -> VMEM
    scratch and sweeping it (register-tiled Moeller-Trumbore, same math as
    trace_pallas.py). Front-to-back order + a per-block bound
    max_r(min(best_t[r], bbox_exit_t[r])) turn the early-out into a real
    BREAK: clusters behind every ray's committed hit cost nothing. This
    replaced two earlier grid-step-per-cluster designs that paid ~1.7 us of
    sequencer bookkeeping per dead/pruned step and whose scalar-prefetched
    worklists were capped by the 1 MB SMEM.

  Exactness: blocks with more than STREAM_K overlapped clusters (not seen in
    practice — block counts track silhouette complexity, not T) are
    re-traced by the stackless BVH walk, compacted to an n/16 ray buffer
    (escalating to the full masked walk above that). Results are
    bit-identical to trace_mesh_brute modulo FP-contract, like the dense
    path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLUSTER_SIZE = 256
BLOCK_RAYS = 512
# 128 measured best for the cluster kernels (round-5 A/B,
# scripts/bench_sweep_frame.py): the 8-accumulator sweep pays more for
# [512, 256] live state than it saves in loop trips (28.0 vs 24.8 ns/ray
# in-frame), and the trace kernel is width-insensitive (105 vs 109 ns/ray
# on the knot) — unlike the dense kernels, whose width-512 tiles win 1.5x.
TRI_TILE = 128
MIN_T = 1e-6
TRI_EPSILON = 1e-8


def cluster_bounds_from_packed(tris_packed, num_triangles: int):
    """[9, T] packed (v0, e1, e2) -> [6, C] cluster AABBs (numpy or jnp).

    Padding triangles beyond num_triangles are excluded; fully-empty clusters
    get an inverted box that can never be hit."""
    import numpy as np
    tp = np.asarray(tris_packed)
    t = tp.shape[1]
    c = max(1, -(-t // CLUSTER_SIZE))
    pad = c * CLUSTER_SIZE - t
    v0 = tp[0:3]
    v1 = tp[0:3] + tp[3:6]
    v2 = tp[0:3] + tp[6:9]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    valid = np.arange(t) < num_triangles
    lo = np.where(valid[None, :], lo, 1e30)
    hi = np.where(valid[None, :], hi, -1e30)
    if pad:
        lo = np.pad(lo, ((0, 0), (0, pad)), constant_values=1e30)
        hi = np.pad(hi, ((0, 0), (0, pad)), constant_values=-1e30)
    lo = lo.reshape(3, c, CLUSTER_SIZE).min(axis=2)
    hi = hi.reshape(3, c, CLUSTER_SIZE).max(axis=2)
    return np.concatenate([lo, hi], axis=0).astype(np.float32)


# ---------------------------------------------------------------------------
# Level 0: per-block cluster shortlists (pure XLA)
# ---------------------------------------------------------------------------

_MASK_CLUSTER_CHUNK = 128


def _block_cluster_mask(origins, dirs, cluster_bounds, active,
                        with_tmin: bool = False):
    """[3, Npad] rays (Npad % BLOCK_RAYS == 0) x [6, C] boxes ->
    bool [NB, C]: does any (active) ray of block b enter cluster c.
    With with_tmin also returns f32 [NB, C]: the minimum (clamped >= 0)
    slab-entry t over the block's hitting rays, +inf where no ray hits —
    the conservative ordering key for front-to-back cluster traversal.

    Clusters are processed in chunks so the [NB, R, chunk] slab intermediate
    stays bounded for very large meshes (C can reach thousands)."""
    n = origins.shape[1]
    nb = n // BLOCK_RAYS
    c = cluster_bounds.shape[1]
    chunk = min(_MASK_CLUSTER_CHUNK, c)
    n_chunks = -(-c // chunk)
    cpad = n_chunks * chunk
    cb = cluster_bounds
    if cpad != c:
        # Inverted padding boxes never test positive.
        pad = jnp.broadcast_to(
            jnp.array([1e30] * 3 + [-1e30] * 3, jnp.float32)[:, None],
            (6, cpad - c))
        cb = jnp.concatenate([cb, pad], axis=1)

    d_safe = jnp.where(jnp.abs(dirs) < 1e-30,
                       jnp.where(dirs < 0, -1e-30, 1e-30), dirs)
    inv_d = 1.0 / d_safe

    o = origins.reshape(3, nb, BLOCK_RAYS)[..., None]      # [3, NB, R, 1]
    inv = inv_d.reshape(3, nb, BLOCK_RAYS)[..., None]
    act = (active.reshape(nb, BLOCK_RAYS)[..., None]
           if active is not None else None)

    def body(i, state):
        mask, btmin = state
        blk = jax.lax.dynamic_slice(cb, (0, i * chunk), (6, chunk))
        lo = blk[0:3][:, None, None, :]                    # [3, 1, 1, chunk]
        hi = blk[3:6][:, None, None, :]
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        tmin = jnp.minimum(t0, t1).max(axis=0)             # [NB, R, chunk]
        tmax = jnp.maximum(t0, t1).min(axis=0)
        tmin = jnp.maximum(tmin, 0.0)
        hit = (tmax >= tmin) & (tmax > MIN_T)
        if act is not None:
            hit &= act
        mask = jax.lax.dynamic_update_slice(
            mask, jnp.any(hit, axis=1), (0, i * chunk))
        if with_tmin:
            entry = jnp.min(jnp.where(hit, tmin, jnp.inf), axis=1)
            btmin = jax.lax.dynamic_update_slice(btmin, entry, (0, i * chunk))
        return mask, btmin

    mask0 = jnp.zeros((nb, cpad), bool)
    tmin0 = jnp.full((nb, cpad) if with_tmin else (1, 1), jnp.inf, jnp.float32)
    mask, btmin = jax.lax.fori_loop(0, n_chunks, body, (mask0, tmin0))
    if with_tmin:
        return mask[:, :c], btmin[:, :c]
    return mask[:, :c]


# ---------------------------------------------------------------------------
# Level 1: streaming kernel (one grid step per ray block)
# ---------------------------------------------------------------------------

def _sweep_cluster(cluster, o_ref, d_ref, tri_ref, bt, btri, mode: int,
                   base=0, mxu: bool = False):
    """Register-tiled Moeller-Trumbore of one ray block against one cluster;
    folds into the PER-LANE best (t, tri id) accumulators [BLOCK_RAYS,
    TRI_TILE] and returns them (the caller lane-reduces once per block —
    per-tile reductions were ~1/3 of kernel time). tri_ref is either a DMA'd
    scratch tile (base=0) or the whole VMEM-resident triangle array (base =
    the cluster's column offset). With mxu, the pair math runs as matmuls
    (ops/trace_mxu.py bilinear factorization) instead of the VPU loop.
    Tie-break: smallest triangle index among equal-t hits (strict `<` per
    lane keeps the earliest tile; the final min-over-lanes picks the smallest
    id), which matches the brute-force oracle's argmin-first semantics."""
    from .trace_pallas import _mt_tile_t
    if mxu:
        from .trace_mxu import _pair_eval, ray_features
        F = ray_features(o_ref[:, :], d_ref[:, :])
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_RAYS, TRI_TILE), 1)

    for tile in range(CLUSTER_SIZE // TRI_TILE):
        tb = tri_ref[:, pl.ds(base + tile * TRI_TILE, TRI_TILE)]
        if mxu:
            t, ok = _pair_eval(F, tb, mode)
            t = jnp.where(ok & (t > MIN_T), t, 1e30)
        else:
            t, det = _mt_tile_t(o_ref, d_ref, tb)
            if mode == 1:    # FORWARD_ONLY: facing < 0 == det > 0
                t = jnp.where(det > 0.0, t, 1e30)
            elif mode == 2:  # BACKWARD_ONLY
                t = jnp.where(det < 0.0, t, 1e30)
        better = t < bt
        btri = jnp.where(better,
                         cluster * CLUSTER_SIZE + tile * TRI_TILE + lane,
                         btri)
        bt = jnp.where(better, t, bt)
    return bt, btri


STREAM_K = 1024  # per-block worklist capacity (= the 1D DMA row stride)


def mesh_exit_t(origins, dirs, cluster_bounds, active):
    """Per-ray exit t from the whole-mesh AABB (union of cluster bounds);
    0 where the ray misses the bbox entirely or is inactive. The cap for
    the streaming kernel's early-out bound."""
    lo = jnp.min(cluster_bounds[0:3], axis=1)
    hi = jnp.max(jnp.where(cluster_bounds[3:6] < cluster_bounds[0:3],
                           -jnp.inf, cluster_bounds[3:6]), axis=1)
    d_safe = jnp.where(jnp.abs(dirs) < 1e-30,
                       jnp.where(dirs < 0, -1e-30, 1e-30), dirs)
    inv = 1.0 / d_safe
    t0 = (lo[:, None] - origins) * inv
    t1 = (hi[:, None] - origins) * inv
    tmin = jnp.maximum(jnp.minimum(t0, t1).max(axis=0), 0.0)
    tmax = jnp.maximum(t0, t1).min(axis=0)
    ok = tmax >= tmin
    if active is not None:
        ok &= active
    return jnp.where(ok, tmax, 0.0)


def _stream_worklist(mask, btmin, kmax: int):
    """mask/btmin [NB, C] -> (ids [NB*K] i32 t-ascending, tmins [NB*K] f32
    (+inf pad), counts [NB] i32 clamped to K, overflow [NB] bool).

    Rows are flattened to 1D with a 1024-element stride: Mosaic requires
    DMA slices to be tile-aligned; [NB, K] arrays carry an (8, 128) tiling
    whose single-row slices are illegal, and 1D i32/f32 arrays are tiled
    (1024), so rows live at 1024-multiple offsets."""
    nb, c = mask.shape
    k = 1024
    rank = jnp.where(mask, btmin, jnp.inf)
    order = jnp.argsort(rank, axis=1).astype(jnp.int32)
    if k > c:
        order = jnp.pad(order, ((0, 0), (0, k - c)))
        rank_sorted = jnp.take_along_axis(rank, order[:, :c], axis=1)
        tmins = jnp.pad(rank_sorted, ((0, 0), (0, k - c)),
                        constant_values=jnp.inf)
    else:
        order = order[:, :k]
        tmins = jnp.take_along_axis(rank, order, axis=1)
    raw = jnp.sum(mask, axis=1).astype(jnp.int32)
    kcap = min(kmax, c, k)
    return (order.reshape(-1), tmins.reshape(-1),
            jnp.minimum(raw, kcap), raw > kcap)


def _stream_kernel(counts_ref, ids_hbm, tmin_hbm, tris_ref, o_ref, d_ref,
                   exit_ref, out_ref, ids_s, tmin_s, tile_v, row_sem,
                   tile_sem, *, mode: int, resident: bool,
                   mxu: bool = False):
    i = pl.program_id(0)
    cnt = counts_ref[i]
    k = ids_s.shape[0]

    row1 = pltpu.make_async_copy(ids_hbm.at[pl.ds(i * k, k)], ids_s,
                                 row_sem.at[0])
    row2 = pltpu.make_async_copy(tmin_hbm.at[pl.ds(i * k, k)], tmin_s,
                                 row_sem.at[1])
    row1.start()
    row2.start()
    big = jnp.full((BLOCK_RAYS, TRI_TILE), 1e30, jnp.float32)
    tri0 = jnp.zeros((BLOCK_RAYS, TRI_TILE), jnp.int32)
    row1.wait()
    row2.wait()

    def tile_dma(cl):
        return pltpu.make_async_copy(
            tris_ref.at[:, pl.ds(cl * CLUSTER_SIZE, CLUSTER_SIZE)],
            tile_v, tile_sem)

    def cond(state):
        return state[1]

    def body(state):
        j, _, bt, btri = state
        if resident:
            # Triangles live whole in VMEM: slice tiles directly — no DMA,
            # ~4x cheaper per cluster (measured round 2, BASELINE.md).
            bt, btri = _sweep_cluster(ids_s[j], o_ref, d_ref, tris_ref,
                                      bt, btri, mode,
                                      base=ids_s[j] * CLUSTER_SIZE, mxu=mxu)
        else:
            dma = tile_dma(ids_s[j])
            dma.start()
            dma.wait()
            bt, btri = _sweep_cluster(ids_s[j], o_ref, d_ref, tile_v,
                                      bt, btri, mode, mxu=mxu)
        nj = j + 1
        # Front-to-back early-out — a real BREAK, unlike the grid-step
        # kernels' predication. Each ray's contribution to the block bound
        # is capped by its whole-mesh-AABB exit t: a ray that has missed
        # everything so far holds best_t = 1e30, but nothing can hit beyond
        # its bbox exit, so it must not poison the bound. The margin keeps
        # the prune conservative under FP reassociation between the slab
        # entry-t and the Moeller-Trumbore t.
        bound = jnp.max(jnp.minimum(jnp.min(bt, axis=1), exit_ref[0, :]))
        go = (nj < cnt) & (bound > tmin_s[nj] * (1.0 - 1e-4) - 1e-4)
        return nj, go, bt, btri

    _, _, bt, btri = jax.lax.while_loop(cond, body,
                                        (jnp.int32(0), cnt > 0, big, tri0))
    best_t = jnp.min(bt, axis=1)
    best_tri = jnp.min(jnp.where(bt <= best_t[:, None], btri,
                                 jnp.int32(2147483647)), axis=1)
    out_ref[0, :] = best_t
    out_ref[1, :] = jax.lax.bitcast_convert_type(best_tri, jnp.float32)


# Triangle arrays at or below this VMEM-resident budget are passed whole to
# the streaming kernels (4.7 MB of the ~16 MB/core VMEM at the cap); larger
# meshes stream 256-triangle tiles by DMA.
RESIDENT_MAX_TRIS = 131072


def trace_clusters_stream(origins, dirs, tris_packed, ids, tmins, counts,
                          exit_t, mode: int, mxu: bool | None = None,
                          interpret: bool = False):
    """origins/dirs [3, Npad]; tris_packed [9, C*CLUSTER_SIZE] (HBM or VMEM
    by size); ids/tmins [NB*K] + counts [NB] from `_stream_worklist`; exit_t
    [Npad] per-ray whole-mesh-AABB exit t (0 for rays that miss the bbox or
    are inactive). Returns (best_t [Npad], best_tri [Npad]); rays in blocks
    with count 0 correctly report miss (out is initialized per block).
    mxu=None reads NR_TRACE_MXU outside the jit (see sweep_shells_pallas)."""
    if mxu is None:
        mxu = os.environ.get("NR_TRACE_MXU") == "1"
    return _trace_clusters_stream(origins, dirs, tris_packed, ids, tmins,
                                  counts, exit_t, mode, mxu, interpret)


@functools.partial(jax.jit, static_argnames=("mode", "mxu", "interpret"))
def _trace_clusters_stream(origins, dirs, tris_packed, ids, tmins, counts,
                           exit_t, mode: int, mxu: bool,
                           interpret: bool = False):
    n = origins.shape[1]
    nb = n // BLOCK_RAYS
    k = ids.shape[0] // nb
    resident = tris_packed.shape[1] <= RESIDENT_MAX_TRIS
    if resident:
        tris_in = tris_packed
        tri_spec = pl.BlockSpec((9, tris_packed.shape[1]),
                                lambda i, c_ref: (0, 0),
                                memory_space=pltpu.MemorySpace.VMEM)
    else:
        # DMA sublane slices must be 8-aligned: pad the 9 rows to 16.
        tris_in = jnp.pad(tris_packed, ((0, 7), (0, 0)))
        tri_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)

    def ray_map(i, counts_ref):
        return (0, i)

    out = pl.pallas_call(
        functools.partial(_stream_kernel, mode=mode, resident=resident,
                          mxu=mxu),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                tri_spec,
                pl.BlockSpec((3, BLOCK_RAYS), ray_map),
                pl.BlockSpec((3, BLOCK_RAYS), ray_map),
                pl.BlockSpec((1, BLOCK_RAYS), ray_map),
            ],
            out_specs=pl.BlockSpec((2, BLOCK_RAYS), ray_map),
            scratch_shapes=[
                pltpu.SMEM((k,), jnp.int32),
                pltpu.SMEM((k,), jnp.float32),
                pltpu.VMEM((16, CLUSTER_SIZE), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n) * 64 * CLUSTER_SIZE * 45 // 4,
            bytes_accessed=int(n) * 32 + 9 * int(tris_packed.shape[1]) * 4,
            transcendentals=0),
    )(counts, ids, tmins, tris_in, origins, dirs, exit_t[None, :])
    return out[0], jax.lax.bitcast_convert_type(out[1], jnp.int32)


# ---------------------------------------------------------------------------
# Clustered dual-mesh dual-facing t-only sweep (shell march queries)
# ---------------------------------------------------------------------------
#
# Same streaming architecture, but the output is the shell-march quadruple
# (outer_fwd, outer_bwd, inner_fwd, inner_bwd) closest-crossing t's instead
# of a hit record: clusters of BOTH shells share one id space (outer first),
# and each swept tile updates the outer or inner pair by its cluster id.
# No early-out (all four mins must be exact), but the cluster prefilter
# already cuts per-block triangle work to the block's frustum footprint —
# the dense sweep_shells_pallas pays O(N * T_outer+T_inner) regardless.


def _sweep4_cluster(cluster, outer_clusters: int, o_ref, d_ref, tri_ref,
                    state, base=0, with_fwd2=True, mxu: bool = False):
    """t-only dual-facing Moeller-Trumbore of one ray block against one
    cluster; folds into the PER-LANE accumulator state (m1f, m2f, m1b, i1f,
    i1b), each [BLOCK_RAYS, TRI_TILE] — outer forward strict two-min pair,
    outer backward min, inner forward/backward mins. The caller lane-reduces
    once per block (trace_pallas._lane_pair_reduce). tri_ref/base as in
    _sweep_cluster. With mxu, the pair math runs as matmuls
    (ops/trace_mxu.py); either way forward/backward come from det's sign
    (facing = -det)."""
    from .trace_pallas import _mt_tile_t, _strict_pair_update
    m1f, m2f, m1b, i1f, i1b = state
    if mxu:
        from .trace_mxu import pair_eval_raw, ray_features
        F = ray_features(o_ref[:, :], d_ref[:, :])

    # Cluster-local per-lane accumulation (strict pair for fwd when fwd2 is
    # tracked), merged into the outer or inner rows ONCE per cluster — the
    # cluster id is dynamic (worklist), so the is_outer select can't be
    # hoisted to a static loop split like the dense kernel's.
    big = jnp.full((BLOCK_RAYS, TRI_TILE), 1e30, jnp.float32)
    lf1, lf2, lb1 = big, big, big
    for tile in range(CLUSTER_SIZE // TRI_TILE):
        tb = tri_ref[:, pl.ds(base + tile * TRI_TILE, TRI_TILE)]
        if mxu:
            t, ok, det = pair_eval_raw(F, tb)
            t = jnp.where(ok & (t > MIN_T), t, 1e30)
        else:
            t, det = _mt_tile_t(o_ref, d_ref, tb)
        tf = jnp.where(det > 0.0, t, 1e30)
        if with_fwd2:
            lf1, lf2 = _strict_pair_update(lf1, lf2, tf)
        else:
            lf1 = jnp.minimum(lf1, tf)
        lb1 = jnp.minimum(lb1, jnp.where(det < 0.0, t, 1e30))

    is_outer = cluster < outer_clusters
    if with_fwd2:
        n1 = jnp.minimum(m1f, lf1)
        n2 = jnp.minimum(jnp.where(m1f > n1, m1f, m2f),
                         jnp.where(lf1 > n1, lf1, lf2))
        m2f = jnp.where(is_outer, n2, m2f)
    else:
        n1 = jnp.minimum(m1f, lf1)
    m1f = jnp.where(is_outer, n1, m1f)
    m1b = jnp.where(is_outer, jnp.minimum(m1b, lb1), m1b)
    i1f = jnp.where(is_outer, i1f, jnp.minimum(i1f, lf1))
    i1b = jnp.where(is_outer, i1b, jnp.minimum(i1b, lb1))
    return m1f, m2f, m1b, i1f, i1b


def _sweep_stream_kernel(counts_ref, ids_hbm, tris_ref, o_ref, d_ref,
                         out_ref, ids_s, tile_v, row_sem, tile_sem, *,
                         outer_clusters: int, resident: bool,
                         with_fwd2: bool, mxu: bool = False):
    from .trace_pallas import _lane_pair_reduce
    i = pl.program_id(0)
    cnt = counts_ref[i]
    k = ids_s.shape[0]

    row = pltpu.make_async_copy(ids_hbm.at[pl.ds(i * k, k)], ids_s,
                                row_sem)
    row.start()
    big = jnp.full((BLOCK_RAYS, TRI_TILE), 1e30, jnp.float32)
    row.wait()

    def body(j, state):
        if resident:
            return _sweep4_cluster(ids_s[j], outer_clusters, o_ref, d_ref,
                                   tris_ref, state,
                                   base=ids_s[j] * CLUSTER_SIZE,
                                   with_fwd2=with_fwd2, mxu=mxu)
        dma = pltpu.make_async_copy(
            tris_ref.at[:, pl.ds(ids_s[j] * CLUSTER_SIZE, CLUSTER_SIZE)],
            tile_v, tile_sem)
        dma.start()
        dma.wait()
        return _sweep4_cluster(ids_s[j], outer_clusters, o_ref, d_ref,
                               tile_v, state, with_fwd2=with_fwd2, mxu=mxu)

    m1f, m2f, m1b, i1f, i1b = jax.lax.fori_loop(
        0, cnt, body, (big, big, big, big, big))

    if with_fwd2:
        of, of2 = _lane_pair_reduce(m1f, m2f)
        out_ref[4, :] = of2
    else:
        of = jnp.min(m1f, axis=1)
    out_ref[0, :] = of
    out_ref[1, :] = jnp.min(m1b, axis=1)
    out_ref[2, :] = jnp.min(i1f, axis=1)
    out_ref[3, :] = jnp.min(i1b, axis=1)


def sweep_clusters_stream(origins, dirs, tris_packed, ids, counts,
                          outer_clusters: int, with_fwd2: bool = False,
                          mxu: bool | None = None, interpret: bool = False):
    """origins/dirs [3, Npad]; tris_packed [9, (Co+Ci)*CLUSTER_SIZE] = outer
    clusters then inner clusters; ids [NB*K]/counts [NB] from
    `_stream_worklist` over the CONCATENATED cluster bounds.
    Returns [5, Npad]: (outer_fwd, outer_bwd, inner_fwd, inner_bwd,
    outer_fwd2) closest crossing t's, 1e30 on miss.
    mxu=None reads NR_TRACE_MXU outside the jit (see sweep_shells_pallas)."""
    if mxu is None:
        mxu = os.environ.get("NR_TRACE_MXU") == "1"
    return _sweep_clusters_stream(origins, dirs, tris_packed, ids, counts,
                                  outer_clusters, with_fwd2, mxu, interpret)


@functools.partial(jax.jit, static_argnames=("outer_clusters", "with_fwd2",
                                              "mxu", "interpret"))
def _sweep_clusters_stream(origins, dirs, tris_packed, ids, counts,
                           outer_clusters: int, with_fwd2: bool, mxu: bool,
                           interpret: bool = False):
    n = origins.shape[1]
    nb = n // BLOCK_RAYS
    k = ids.shape[0] // nb
    resident = tris_packed.shape[1] <= RESIDENT_MAX_TRIS
    if resident:
        tris_in = tris_packed
        tri_spec = pl.BlockSpec((9, tris_packed.shape[1]),
                                lambda i, c_ref: (0, 0),
                                memory_space=pltpu.MemorySpace.VMEM)
    else:
        tris_in = jnp.pad(tris_packed, ((0, 7), (0, 0)))
        tri_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)

    def ray_map(i, counts_ref):
        return (0, i)

    rows = 5 if with_fwd2 else 4
    return pl.pallas_call(
        functools.partial(_sweep_stream_kernel,
                          outer_clusters=outer_clusters, resident=resident,
                          with_fwd2=with_fwd2, mxu=mxu),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                tri_spec,
                pl.BlockSpec((3, BLOCK_RAYS), ray_map),
                pl.BlockSpec((3, BLOCK_RAYS), ray_map),
            ],
            out_specs=pl.BlockSpec((rows, BLOCK_RAYS), ray_map),
            scratch_shapes=[
                pltpu.SMEM((k,), jnp.int32),
                pltpu.VMEM((16, CLUSTER_SIZE), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(n) * 32 * CLUSTER_SIZE * 50 // 4,
            bytes_accessed=int(n) * 44 + 9 * int(tris_packed.shape[1]) * 4,
            transcendentals=0),
    )(counts, ids, tris_in, origins, dirs)

"""Batched ray-mesh intersection — the TPU replacement for both the
reference's SW stack-DFS kernel (mesh_traversal.cuh:118-222) and its OptiX
HW path.

Two execution strategies, chosen at trace time by static mesh size:

1. DENSE (meshes up to DENSE_MAX_TRIANGLES, e.g. the shells): every ray tests
   every triangle in [ray-chunk x tri-chunk] tiles of pure vector math — no
   gathers, no data-dependent loop, the VPU runs at full rate. On this
   hardware XLA's gather throughput (~300M indices/s) makes O(N*T) dense work
   FASTER than a gather-driven BVH walk up to tens of thousands of triangles.

2. BVH threaded DFS (large meshes): all rays advance in lockstep through a
   stackless skip-link walk. Per iteration each ray issues exactly TWO
   gathers — one packed node row [11, Nn] and (for leaf phases) packed
   triangle rows [9, T] — instead of 20+ separate takes; node ints ride the
   same gather bitcast to f32. Early-out pruning against the running best-t
   is kept (node AABBs test with t_max = best_t, like the reference's
   `intersectAabb(..., bestPi.t, ...)`).

All vectors are channel-major [3, N] (ops/linalg.py layout note).
TraceMode facing culls (FORWARD_ONLY / BACKWARD_ONLY / ANY,
mesh_traversal.cuh:96-111) are compile-time branches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .intersect import intersect_aabb
from .linalg import cross, dot

# TraceMode (mesh_traversal.cuh:107-111)
ANY = 0
FORWARD_ONLY = 1
BACKWARD_ONLY = 2

MIN_T = 1e-6  # fixed minimum hit distance (mesh_traversal.cuh:131)
TRI_EPSILON = 1e-8


def pallas_interpret_requested() -> bool:
    """NR_PALLAS_INTERPRET=1 runs every Pallas kernel in interpret mode —
    combined with forcing the `tpu` platform_dependent branch, the FULL
    production TPU compute path executes on CPU for end-to-end validation
    (tests/test_frame_interpret.py). Read at trace time."""
    import os
    return os.environ.get("NR_PALLAS_INTERPRET") == "1"

# Dense path wins while N*T vector work beats gather-bound BVH walking.
DENSE_MAX_TRIANGLES = 16384
_DENSE_TRI_CHUNK = 512

# Shell sweeps switch from the dense dual-mesh kernel to the clustered
# streaming sweep above this combined triangle count (measured crossover,
# BASELINE.md round 2).
_CLUSTERED_SWEEP_MIN_TRIS = 4096

# Closest-hit traces switch from the dense all-pairs kernel to the clustered
# streaming trace (TPU) above this triangle count.
_CLUSTERED_TRACE_MIN_TRIS = 4096


class TraceResult(NamedTuple):
    t: jnp.ndarray        # [N] f32, 1e30 on miss
    tri: jnp.ndarray      # [N] i32 triangle index (reordered leaf order)
    u: jnp.ndarray        # [N] f32 barycentric
    v: jnp.ndarray        # [N] f32 barycentric
    hit: jnp.ndarray      # [N] bool


def _ray_hits_box(origins, dirs, bmin, bmax):
    """Conservative slab test of [3, N] rays vs one AABB (t >= 0). The box
    is padded by a relative epsilon so FP rounding can never reject a ray
    that intersects geometry inside it; degenerate (zero) direction
    components are handled explicitly (0 * inf would poison the slabs with
    NaN). Used as a block-skip prefilter for the dense sweep kernel."""
    pad = 1e-4 * jnp.max(bmax - bmin) + 1e-6
    lo = (bmin - pad)[:, None]
    hi = (bmax + pad)[:, None]
    deg = jnp.abs(dirs) < 1e-30
    inv = 1.0 / jnp.where(deg, 1.0, dirs)
    t0 = (lo - origins) * inv
    t1 = (hi - origins) * inv
    inside = (origins >= lo) & (origins <= hi)
    near = jnp.where(deg, jnp.where(inside, -jnp.inf, jnp.inf),
                     jnp.minimum(t0, t1))
    far = jnp.where(deg, jnp.where(inside, jnp.inf, -jnp.inf),
                    jnp.maximum(t0, t1))
    tmin = jnp.max(near, axis=0)
    tmax = jnp.min(far, axis=0)
    return tmax >= jnp.maximum(tmin, 0.0)


def _miss(n):
    return TraceResult(
        t=jnp.full((n,), 1e30, jnp.float32),
        tri=jnp.zeros((n,), jnp.int32),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
        hit=jnp.zeros((n,), bool),
    )


def _mt_from_packed(origins, dirs, v0, e1, e2, mode: int):
    """Möller-Trumbore on precomputed (v0, e1, e2) rows; operands broadcast
    to a common [..., 3-major] shape. Returns (t, u, v, ok)."""
    pvec = cross(dirs, e2)
    det = dot(e1, pvec)
    ok = jnp.abs(det) >= TRI_EPSILON
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = origins - v0
    u = dot(tvec, pvec) * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)
    qvec = cross(tvec, e1)
    v = dot(dirs, qvec) * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = dot(e2, qvec) * inv_det
    ok &= t > TRI_EPSILON

    if mode != ANY:
        # Facing sign from the determinant: det = e1.(d x e2) = -d.(e1 x e2)
        # = -dot(geometric normal, d), so FORWARD (normal against the ray,
        # facing < 0) == det > 0. Saves the cross+dot the reference's
        # normal-based cull pays (mesh_traversal.cuh:96-111 semantics kept);
        # kernels (trace_pallas/trace_cluster/trace_mxu) use the identical
        # det arithmetic, so twin/kernel decisions agree bit-exactly.
        if mode == FORWARD_ONLY:
            ok &= det > 0.0
        else:  # BACKWARD_ONLY
            ok &= det < 0.0
    return t, u, v, ok


def trace_mesh(mesh, origins, dirs, mode: int = ANY,
               active=None, presorted: bool = False) -> TraceResult:
    """Closest-hit trace of [N] rays against one mesh.

    Args:
      mesh: MeshArrays.
      origins, dirs: [3, N] f32 (channel-major).
      mode: ANY / FORWARD_ONLY / BACKWARD_ONLY (static).
      active: optional [N] bool — inactive rays skip work (masked lanes, the
        replacement for CUDA stream compaction).
      presorted: caller guarantees rays are already in
        octant/morton-coherent order (`_ray_sort_order`) — the two-level
        path then skips its own argsort + permutes (a ~20 ms cost at 262k
        rays that the training sampler would otherwise pay per trace).
    """
    n = origins.shape[1]
    if mesh.is_empty:
        return _miss(n)
    if mesh.num_triangles <= _CLUSTERED_TRACE_MIN_TRIS:
        return _trace_dense(mesh, origins, dirs, mode, active)

    def tpu_fn(origins, dirs):
        # Above the crossover the clustered streaming trace beats the dense
        # all-pairs sweep even for "small" meshes: sorted camera blocks
        # touch only their frustum's clusters, with front-to-back early-out.
        return _trace_two_level(mesh, origins, dirs, mode, active,
                                presorted=presorted)

    def default_fn(origins, dirs):
        if mesh.num_triangles <= DENSE_MAX_TRIANGLES:
            return _trace_dense_xla(mesh, origins, dirs, mode, active)
        return _trace_bvh(mesh, origins, dirs, mode, active)

    return jax.lax.platform_dependent(origins, dirs, tpu=tpu_fn,
                                      default=default_fn)


# ---------------------------------------------------------------------------
# Fused shell sweep (dual mesh, dual facing)
# ---------------------------------------------------------------------------

class ShellSweep(NamedTuple):
    """Nearest-hit t per facing per shell, 1e30 on miss. An ANY-mode closest
    hit is exactly min(fwd, bwd): the determinant cull (|det| >= TRI_EPSILON)
    guarantees facing != 0, so every accepted hit is strictly forward or
    backward. outer_fwd2 is the SECOND-nearest outer forward crossing — the
    camera march derives its first re-entry from it (crossings of a closed
    surface alternate), skipping a separate trace."""
    outer_fwd: jnp.ndarray  # [N] f32
    outer_bwd: jnp.ndarray
    inner_fwd: jnp.ndarray
    inner_bwd: jnp.ndarray
    outer_fwd2: jnp.ndarray


def _dense_t_only(mesh, origins, dirs, mode: int, two_min: bool = False):
    """XLA twin of the sweep for one (mesh, mode): the `_trace_dense_xla`
    chunk loop reduced to min-t (no argmin / u / v). With two_min, returns
    (t1, t2): the two smallest accepted t's."""
    n = origins.shape[1]
    num_tris = mesh.indices.shape[1]
    chunk = min(_DENSE_TRI_CHUNK, max(1, num_tris))
    num_chunks = -(-num_tris // chunk)
    padded = num_chunks * chunk
    tp = mesh.tris_packed
    if padded != num_tris:
        tp = jnp.pad(tp, ((0, 0), (0, padded - num_tris)))
    o = origins[:, :, None]
    d = dirs[:, :, None]

    def body(c, state):
        t1, t2 = state
        block = jax.lax.dynamic_slice(tp, (0, c * chunk), (9, chunk))
        t, _, _, ok = _mt_from_packed(o, d, block[0:3][:, None, :],
                                      block[3:6][:, None, :],
                                      block[6:9][:, None, :], mode)
        t = jnp.where(ok & (t > MIN_T), t, 1e30)
        m1 = jnp.min(t, axis=1)
        if two_min:
            # Strictly-greater second min (equal-t duplicate crossings
            # collapse) — must match the Pallas sweep's fwd2 semantics
            # (trace_pallas._sweep_kernel). STRICT merge: the (min,
            # strict-second-min) of a multiset is grouping-independent, so
            # any chunk/tile/lane partition gives bit-identical results.
            m2 = jnp.min(jnp.where(t > m1[:, None], t, 1e30), axis=1)
            new1 = jnp.minimum(t1, m1)
            t2 = jnp.minimum(jnp.where(t1 > new1, t1, t2),
                             jnp.where(m1 > new1, m1, m2))
            return new1, t2
        return jnp.minimum(t1, m1), t2

    init = (jnp.full((n,), 1e30, jnp.float32),
            jnp.full((n,), 1e30, jnp.float32))
    t1, t2 = jax.lax.fori_loop(0, num_chunks, body, init)
    return (t1, t2) if two_min else t1


def sweep_shells(outer, inner, origins, dirs,
                 with_fwd2: bool = False) -> ShellSweep:
    """ONE dense pass over both shell meshes computing all four facing-culled
    closest hits the march and early-termination stages consume. Replaces up
    to five trace_mesh launches per bounce stage (reference kernels
    traceSegmentExitsKernel cuda_renderer_neural.cu:858-930,
    checkBounceEarlyTerminationKernel :503-553,
    traceOuterShellEntryFromRaysKernel :773-852).

    origins/dirs: [3, N] channel-major. Returns raw t's — callers apply their
    own active masks.
    """
    n = origins.shape[1]
    miss = jnp.full((n,), 1e30, jnp.float32)
    outer_empty = outer.is_empty
    inner_empty = inner.is_empty
    if outer_empty and inner_empty:
        return ShellSweep(miss, miss, miss, miss, miss)

    big = max(0 if outer_empty else outer.num_triangles,
              0 if inner_empty else inner.num_triangles)
    if big > DENSE_MAX_TRIANGLES or outer_empty:
        # Shells this large (or outer-less configs) take the generic paths.
        def one(mesh, mode, empty):
            if empty:
                return miss
            r = trace_mesh(mesh, origins, dirs, mode)
            return jnp.where(r.hit, r.t, 1e30)
        of = one(outer, FORWARD_ONLY, outer_empty)
        # Second forward crossing via a re-trace just beyond the first.
        if outer_empty or not with_fwd2:
            of2 = miss
        else:
            o2 = origins + dirs * (jnp.where(of < 1e30, of, 0.0)
                                   + 1e-5)[None, :]
            r2 = trace_mesh(outer, o2, dirs, FORWARD_ONLY,
                            active=of < 1e30)
            of2 = jnp.where(r2.hit & (of < 1e30), of + 1e-5 + r2.t, 1e30)
        return ShellSweep(of,
                          one(outer, BACKWARD_ONLY, outer_empty),
                          one(inner, FORWARD_ONLY, inner_empty),
                          one(inner, BACKWARD_ONLY, inner_empty),
                          of2)

    from .trace_pallas import (BLOCK_RAYS, SWEEP_TRI_TILE,
                               sweep_shells_pallas)

    def pad_tris(mesh):
        tris = mesh.tris_packed
        num = tris.shape[1]
        pad = -(-num // SWEEP_TRI_TILE) * SWEEP_TRI_TILE
        if pad != num:
            tris = jnp.pad(tris, ((0, 0), (0, pad - num)))
        return tris, pad // SWEEP_TRI_TILE

    outer_tp, outer_tiles = pad_tris(outer)
    if inner_empty:
        inner_tp, inner_tiles = jnp.zeros((9, 0), jnp.float32), 0
    else:
        inner_tp, inner_tiles = pad_tris(inner)
    tp = jnp.concatenate([outer_tp, inner_tp], axis=1)

    def tpu_fn(origins, dirs):
        n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
        o, d = origins, dirs
        act = None
        if n_pad != n:
            o = jnp.pad(o, ((0, 0), (0, n_pad - n)))
            d = jnp.pad(d, ((0, 0), (0, n_pad - n)))
            # All-zero padding rays can pass clamped slab tests; keep them
            # out of the cluster worklists.
            act = jnp.pad(jnp.ones((n,), bool), (0, n_pad - n))

        total = outer.num_triangles + (0 if inner_empty
                                       else inner.num_triangles)
        co = outer.cluster_bounds.shape[1]
        ci = 0 if inner_empty else inner.cluster_bounds.shape[1]
        if total >= _CLUSTERED_SWEEP_MIN_TRIS and co + ci <= 1024 \
                and not inner_empty:
            # Clustered streaming sweep: per-block triangle work shrinks to
            # the block's frustum footprint instead of O(T_outer + T_inner).
            from . import trace_cluster as tc
            cb = jnp.concatenate([outer.cluster_bounds, inner.cluster_bounds],
                                 axis=1)
            tpo = outer.tris_packed
            if tpo.shape[1] != co * tc.CLUSTER_SIZE:
                tpo = jnp.pad(
                    tpo, ((0, 0), (0, co * tc.CLUSTER_SIZE - tpo.shape[1])))
            tpi = inner.tris_packed
            if tpi.shape[1] != ci * tc.CLUSTER_SIZE:
                tpi = jnp.pad(
                    tpi, ((0, 0), (0, ci * tc.CLUSTER_SIZE - tpi.shape[1])))
            tp_cl = jnp.concatenate([tpo, tpi], axis=1)
            mask = tc._block_cluster_mask(o, d, cb, act)
            ids, _, counts, _ = tc._stream_worklist(
                mask, jnp.where(mask, 0.0, jnp.inf), tc.STREAM_K)
            out = tc.sweep_clusters_stream(
                o, d, tp_cl, ids, counts, co, with_fwd2=with_fwd2,
                interpret=pallas_interpret_requested())
            return ShellSweep(out[0, :n], out[1, :n], out[2, :n], out[3, :n],
                              out[4, :n] if with_fwd2 else miss)

        # Per-block AABB prefilter: a 512-ray block whose rays all miss the
        # shells' union root AABB (conservatively padded) skips the whole
        # dual-mesh tile sweep inside the kernel — typical camera frames
        # have the object covering a fraction of the screen, and bounce
        # prefixes carry dead tail blocks past `count`.
        bmin = outer.bvh_bounds_min[:, 0]
        bmax = outer.bvh_bounds_max[:, 0]
        if not inner_empty:
            bmin = jnp.minimum(bmin, inner.bvh_bounds_min[:, 0])
            bmax = jnp.maximum(bmax, inner.bvh_bounds_max[:, 0])
        hit_box = _ray_hits_box(o, d, bmin, bmax)
        if act is not None:
            hit_box &= act
        block_mask = jnp.any(
            hit_box.reshape(-1, BLOCK_RAYS), axis=1).astype(jnp.int32)
        out = sweep_shells_pallas(o, d, tp, outer_tiles,
                                  outer_tiles + inner_tiles,
                                  with_fwd2=with_fwd2,
                                  interpret=pallas_interpret_requested(),
                                  block_mask=block_mask)
        return ShellSweep(out[0, :n], out[1, :n],
                          out[2, :n] if not inner_empty else miss,
                          out[3, :n] if not inner_empty else miss,
                          out[4, :n] if with_fwd2 else miss)

    def default_fn(origins, dirs):
        if with_fwd2:
            of, of2 = _dense_t_only(outer, origins, dirs, FORWARD_ONLY,
                                    two_min=True)
        else:
            of, of2 = _dense_t_only(outer, origins, dirs, FORWARD_ONLY), miss
        return ShellSweep(
            of,
            _dense_t_only(outer, origins, dirs, BACKWARD_ONLY),
            _dense_t_only(inner, origins, dirs, FORWARD_ONLY)
            if not inner_empty else miss,
            _dense_t_only(inner, origins, dirs, BACKWARD_ONLY)
            if not inner_empty else miss,
            of2)

    return jax.lax.platform_dependent(origins, dirs, tpu=tpu_fn,
                                      default=default_fn)


# ---------------------------------------------------------------------------
# Dense path
# ---------------------------------------------------------------------------

def _trace_dense(mesh, origins, dirs, mode: int, active) -> TraceResult:
    """All rays x all triangles — Pallas kernel on TPU, XLA tiles elsewhere.

    Work per ray is O(T) but perfectly dense: no gathers, no data-dependent
    control flow. On TPU the Pallas kernel (ops/trace_pallas.py) keeps the
    triangle array in VMEM and the tiles in registers. Dispatch is per
    lowering platform (lax.platform_dependent), so the same jitted program
    works on CPU meshes (tests, multi-chip dry runs) and the TPU.
    """
    def tpu_fn(origins, dirs):
        return _trace_dense_tpu(mesh, origins, dirs, mode, active)

    def default_fn(origins, dirs):
        return _trace_dense_xla(mesh, origins, dirs, mode, active)

    return jax.lax.platform_dependent(origins, dirs, tpu=tpu_fn,
                                      default=default_fn)


def _trace_dense_tpu(mesh, origins, dirs, mode: int, active) -> TraceResult:
    from .trace_pallas import BLOCK_RAYS, TRI_TILE, trace_dense_pallas
    import os as _os
    use_mxu = _os.environ.get("NR_TRACE_MXU") == "1"
    if use_mxu:
        # Opt-in matmul formulation (ops/trace_mxu.py): pair math on the
        # MXU at bf16x6, ~1-ulp off the VPU kernel — A/B pending, see
        # BASELINE.md roadmap lever 6.
        from .trace_mxu import trace_dense_mxu_pallas as trace_dense_pallas  # noqa: F811
    n = origins.shape[1]
    num_tris = mesh.indices.shape[1]
    t_pad = -(-num_tris // TRI_TILE) * TRI_TILE
    tp = mesh.tris_packed
    if t_pad != num_tris:
        tp = jnp.pad(tp, ((0, 0), (0, t_pad - num_tris)))
    n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
    o = origins
    d = dirs
    if n_pad != n:
        o = jnp.pad(o, ((0, 0), (0, n_pad - n)))
        d = jnp.pad(d, ((0, 0), (0, n_pad - n)))
    kwargs = {}
    if not use_mxu:
        # Per-block skip: inactive rays and rays missing the (padded) root
        # AABB contribute nothing; 512-ray blocks with no contributing ray
        # skip the tile sweep inside the kernel.
        hit_box = _ray_hits_box(o, d, mesh.bvh_bounds_min[:, 0],
                                mesh.bvh_bounds_max[:, 0])
        if active is not None:
            hit_box &= (jnp.pad(active, (0, n_pad - n)) if n_pad != n
                        else active)
        elif n_pad != n:
            hit_box &= jnp.arange(n_pad) < n
        kwargs["block_mask"] = jnp.any(
            hit_box.reshape(-1, BLOCK_RAYS), axis=1).astype(jnp.int32)
    best_t, best_tri = trace_dense_pallas(o, d, tp, mode, t_pad // TRI_TILE,
                                          interpret=pallas_interpret_requested(),
                                          **kwargs)
    best_t = best_t[:n]
    best_tri = jnp.clip(best_tri[:n], 0, num_tris - 1)
    hit = best_t < 1e30
    if active is not None:
        hit &= active
        best_t = jnp.where(hit, best_t, 1e30)
    tb = jnp.take(mesh.tris_packed, best_tri, axis=1)
    _, u, v, _ = _mt_from_packed(origins, dirs, tb[0:3], tb[3:6], tb[6:9], ANY)
    return TraceResult(t=best_t, tri=best_tri,
                       u=jnp.where(hit, u, 0.0), v=jnp.where(hit, v, 0.0),
                       hit=hit)


def _trace_dense_xla(mesh, origins, dirs, mode: int, active) -> TraceResult:
    n = origins.shape[1]
    num_tris = mesh.indices.shape[1]
    chunk = min(_DENSE_TRI_CHUNK, max(1, num_tris))
    num_chunks = -(-num_tris // chunk)
    padded = num_chunks * chunk

    tp = mesh.tris_packed
    if padded != num_tris:
        # Degenerate padding triangles (zero edges) never pass the det test.
        tp = jnp.pad(tp, ((0, 0), (0, padded - num_tris)))

    o = origins[:, :, None]   # [3, N, 1]
    d = dirs[:, :, None]      # [3, N, 1]

    def body(c, state):
        best_t, best_tri = state
        block = jax.lax.dynamic_slice(tp, (0, c * chunk), (9, chunk))
        v0 = block[0:3][:, None, :]   # [3, 1, C]
        e1 = block[3:6][:, None, :]
        e2 = block[6:9][:, None, :]
        t, _, _, ok = _mt_from_packed(o, d, v0, e1, e2, mode)  # [N, C]
        t = jnp.where(ok & (t > MIN_T), t, 1e30)
        # Pure reductions only (min + argmin); u/v are recomputed once at the
        # end from the winning triangle so the hot loop issues NO gathers.
        tc = jnp.min(t, axis=1)
        ci = jnp.argmin(t, axis=1).astype(jnp.int32)
        better = tc < best_t
        best_t = jnp.where(better, tc, best_t)
        best_tri = jnp.where(better, c * chunk + ci, best_tri)
        return best_t, best_tri

    init = (jnp.full((n,), 1e30, jnp.float32), jnp.zeros((n,), jnp.int32))
    best_t, best_tri = jax.lax.fori_loop(0, num_chunks, body, init)

    hit = best_t < 1e30
    if active is not None:
        hit &= active
        best_t = jnp.where(hit, best_t, 1e30)

    # Recompute u/v for the winners (identical arithmetic -> identical values).
    tb = jnp.take(mesh.tris_packed,
                  jnp.clip(best_tri, 0, num_tris - 1), axis=1)
    _, u, v, _ = _mt_from_packed(origins, dirs, tb[0:3], tb[3:6], tb[6:9], ANY)
    u = jnp.where(hit, u, 0.0)
    v = jnp.where(hit, v, 0.0)
    return TraceResult(t=best_t, tri=best_tri, u=u, v=v, hit=hit)


# ---------------------------------------------------------------------------
# Two-level clustered dense path (large meshes, TPU)
# ---------------------------------------------------------------------------

_SORT_BITS = 4  # morton bits per axis in the ray sort key


def _ray_sort_order(origins, dirs, active):
    """Stable sort order grouping rays by direction octant, origin morton
    cell, then DIRECTION morton cell, so 512-ray blocks form tight spatial
    frusta and build small cluster shortlists. The equivalent of the
    ray-sorting wavefront path tracers use on GPUs. Camera batches share one
    origin cell, so the direction bits take over and blocks become image
    tiles; bounce batches group by surface locality first. Inactive rays
    sort to the end (they are masked out of shortlists)."""
    n = origins.shape[1]
    octant = ((dirs[0] < 0).astype(jnp.int32) * 4 +
              (dirs[1] < 0).astype(jnp.int32) * 2 +
              (dirs[2] < 0).astype(jnp.int32))
    if active is not None:
        lo = jnp.min(jnp.where(active[None, :], origins, jnp.inf), axis=1)
        hi = jnp.max(jnp.where(active[None, :], origins, -jnp.inf), axis=1)
        # All-inactive batches leave an inverted bbox; any finite box works.
        bad = lo[0] > hi[0]
        lo = jnp.where(bad, 0.0, lo)
        hi = jnp.where(bad, 1.0, hi)
    else:
        lo = jnp.min(origins, axis=1)
        hi = jnp.max(origins, axis=1)
    cells = 1 << _SORT_BITS
    scale = cells / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((origins - lo[:, None]) * scale[:, None]).astype(jnp.int32),
                 0, cells - 1)
    qd = jnp.clip((jnp.abs(dirs) * cells).astype(jnp.int32), 0, cells - 1)
    omorton = jnp.zeros((n,), jnp.int32)
    dmorton = jnp.zeros((n,), jnp.int32)
    for b in range(_SORT_BITS):
        for a in range(3):
            omorton |= ((q[a] >> b) & 1) << (3 * b + (2 - a))
            dmorton |= ((qd[a] >> b) & 1) << (3 * b + (2 - a))
    key = (octant << (6 * _SORT_BITS)) | (omorton << (3 * _SORT_BITS)) \
        | dmorton
    if active is not None:
        # int32 max strictly exceeds every active key (octant<<24 | mortons
        # < 2^27), so actives occupy EXACTLY the first count positions —
        # compacted-prefix callers rely on this.
        key = jnp.where(active, key, jnp.iinfo(jnp.int32).max)
    return jnp.argsort(key)


_CHUNK_RAYS = 512 * 512  # 262,144 rays per clustered-trace chunk


def _trace_two_level(mesh, origins, dirs, mode: int, active,
                     presorted: bool = False) -> TraceResult:
    """Octant/morton-sorted rays -> clustered dense trace -> unsort.

    Batches beyond _CHUNK_RAYS run as a lax.map over sorted contiguous
    chunks: one kernel compilation, bounded [NB, C] mask intermediates and
    bounded scalar-prefetch worklists (the SMEM budget), and the sort means
    each chunk stays spatially coherent. presorted=True skips the sort and
    both permutes (the caller already ordered the rays)."""
    n = origins.shape[1]
    if presorted:
        o_s, d_s, act_s = origins, dirs, active
    else:
        order = _ray_sort_order(origins, dirs, active)
        inv = jnp.zeros((n,), order.dtype).at[order].set(
            jnp.arange(n, dtype=order.dtype))
        # ONE packed gather for the permute (per-index overhead dominates —
        # scripts/bench_gather_pack.py measured 5.5x for packed windows).
        rows = [origins, dirs]
        if active is not None:
            rows.append(active[None, :].astype(jnp.float32))
        ps = jnp.take(jnp.concatenate(rows, axis=0), order, axis=1)
        o_s, d_s = ps[0:3], ps[3:6]
        act_s = (ps[6] > 0.0) if active is not None else None

    if n > _CHUNK_RAYS:
        m = -(-n // _CHUNK_RAYS)
        n_pad = m * _CHUNK_RAYS
        if act_s is None:
            act_s = jnp.ones((n,), bool)
        o_s = jnp.pad(o_s, ((0, 0), (0, n_pad - n)))
        d_s = jnp.pad(d_s, ((0, 0), (0, n_pad - n)))
        act_s = jnp.pad(act_s, (0, n_pad - n))
        o_c = o_s.reshape(3, m, _CHUNK_RAYS).transpose(1, 0, 2)
        d_c = d_s.reshape(3, m, _CHUNK_RAYS).transpose(1, 0, 2)
        a_c = act_s.reshape(m, _CHUNK_RAYS)
        res = jax.lax.map(
            lambda args: _trace_two_level_impl(
                mesh, args[0], args[1], mode, args[2]),
            (o_c, d_c, a_c))
        res = TraceResult(*(x.reshape(-1)[:n] for x in res))
    else:
        res = _trace_two_level_impl(mesh, o_s, d_s, mode, act_s)
    if presorted:
        return res
    # Un-permute all 5 result rows through ONE packed gather (bitcast keeps
    # tri exact; bool survives the f32 round trip as 0.0/1.0).
    pr = jnp.take(jnp.stack(
        [res.t, jax.lax.bitcast_convert_type(res.tri, jnp.float32),
         res.u, res.v, res.hit.astype(jnp.float32)], axis=0), inv, axis=1)
    return TraceResult(t=pr[0],
                       tri=jax.lax.bitcast_convert_type(pr[1], jnp.int32),
                       u=pr[2], v=pr[3], hit=pr[4] > 0.0)


def _trace_two_level_impl(mesh, origins, dirs, mode: int, active) -> TraceResult:
    """Cluster-AABB pooled worklist + per-cluster dense Pallas sweep
    (ops/trace_cluster.py); rays in blocks whose worklist entries were
    truncated by the pool budget are re-traced by the BVH walk (usually zero
    rays -> the masked while_loop exits immediately). Replaces the role of
    OptiX GAS for >16k-tri meshes."""
    from . import trace_cluster as tc

    n = origins.shape[1]
    num_tris = mesh.indices.shape[1]

    n_pad = -(-n // tc.BLOCK_RAYS) * tc.BLOCK_RAYS
    o, d = origins, dirs
    act_pad = active
    if n_pad != n:
        o = jnp.pad(o, ((0, 0), (0, n_pad - n)))
        d = jnp.pad(d, ((0, 0), (0, n_pad - n)))
        if active is not None:
            act_pad = jnp.pad(active, (0, n_pad - n))
        else:
            # Padding rays are all-zero (degenerate); they can still pass a
            # clamped slab test, so mask them out of the cluster shortlists.
            act_pad = jnp.pad(jnp.ones((n,), bool), (0, n_pad - n))

    c = mesh.cluster_bounds.shape[1]
    t_pad = c * tc.CLUSTER_SIZE
    tp = mesh.tris_packed
    if t_pad != num_tris:
        tp = jnp.pad(tp, ((0, 0), (0, t_pad - num_tris)))

    mask, btmin = tc._block_cluster_mask(o, d, mesh.cluster_bounds, act_pad,
                                         with_tmin=True)
    ids, tmins, counts, overflow = tc._stream_worklist(mask, btmin,
                                                       tc.STREAM_K)
    exit_t = tc.mesh_exit_t(o, d, mesh.cluster_bounds, act_pad)
    best_t, best_tri = tc.trace_clusters_stream(
        o, d, tp, ids, tmins, counts, exit_t, mode,
        interpret=pallas_interpret_requested())
    best_t = best_t[:n]
    best_tri = jnp.clip(best_tri[:n], 0, num_tris - 1)

    # Exactness fallback: rays in budget-truncated blocks walk the BVH.
    # A full-batch masked walk would pay the whole while_loop's vector cost
    # even for one overflowed block, so the overflow rays are COMPACTED into
    # an n/16 buffer first (the march-compaction pattern); the rare case of
    # more overflow rays than the buffer escalates to the full masked walk
    # under lax.cond.
    over_rays = jnp.repeat(overflow, tc.BLOCK_RAYS)[:n]
    if active is not None:
        over_rays &= active
    cap = min(n, max(tc.BLOCK_RAYS, n // 16))
    n_over = jnp.sum(over_rays)

    def walk_compacted(args):
        bt, btri = args
        idx = jnp.nonzero(over_rays, size=cap, fill_value=0)[0]
        valid = jnp.arange(cap) < n_over
        w = _trace_bvh(mesh, jnp.take(origins, idx, axis=1),
                       jnp.take(dirs, idx, axis=1), mode, valid)
        bt = bt.at[idx].set(jnp.where(valid, w.t, bt[idx]))
        btri = btri.at[idx].set(jnp.where(valid, w.tri, btri[idx]))
        return bt, btri

    def walk_full(args):
        bt, btri = args
        w = _trace_bvh(mesh, origins, dirs, mode, over_rays)
        return (jnp.where(over_rays, w.t, bt),
                jnp.where(over_rays, w.tri, btri))

    best_t, best_tri = jax.lax.cond(
        n_over <= cap, walk_compacted, walk_full, (best_t, best_tri))

    hit = best_t < 1e30
    if active is not None:
        hit &= active
        best_t = jnp.where(hit, best_t, 1e30)
    tb = jnp.take(mesh.tris_packed, best_tri, axis=1)
    _, u, v, _ = _mt_from_packed(origins, dirs, tb[0:3], tb[3:6], tb[6:9], ANY)
    return TraceResult(t=best_t, tri=best_tri,
                       u=jnp.where(hit, u, 0.0), v=jnp.where(hit, v, 0.0),
                       hit=hit)


# ---------------------------------------------------------------------------
# BVH threaded-DFS path
# ---------------------------------------------------------------------------

def _trace_bvh(mesh, origins, dirs, mode: int, active) -> TraceResult:
    n = origins.shape[1]

    # Safe reciprocal: avoids 0*inf NaNs in the slab test (CUDA's fminf
    # ignores NaNs; XLA's min propagates them).
    d_safe = jnp.where(jnp.abs(dirs) < 1e-30,
                       jnp.where(dirs < 0, -1e-30, 1e-30), dirs)
    inv_dirs = 1.0 / d_safe

    node0 = jnp.zeros((n,), jnp.int32)
    if active is not None:
        node0 = jnp.where(active, node0, -1)

    max_leaf = max(1, mesh.max_leaf)
    num_nodes = mesh.bvh_left.shape[0]
    num_tris = mesh.indices.shape[1]

    def cond(state):
        node = state[0]
        return jnp.any(node >= 0)

    def body(state):
        node, best_t, best_tri, best_u, best_v = state
        live = node >= 0
        nidx = jnp.clip(node, 0, num_nodes - 1)

        g = jnp.take(mesh.nodes_packed, nidx, axis=1)  # [11, N] one gather
        bmin, bmax = g[0:3], g[3:6]
        left = jax.lax.bitcast_convert_type(g[6], jnp.int32)
        skip = jax.lax.bitcast_convert_type(g[7], jnp.int32)
        first = jax.lax.bitcast_convert_type(g[8], jnp.int32)
        count = jax.lax.bitcast_convert_type(g[9], jnp.int32)
        is_leaf = jax.lax.bitcast_convert_type(g[10], jnp.int32) != 0

        box_hit, _ = intersect_aabb(origins, inv_dirs, bmin, bmax, best_t)
        box_hit &= live

        process = box_hit & is_leaf
        for i in range(max_leaf):
            tri_idx = jnp.clip(first + i, 0, num_tris - 1)
            valid = process & (i < count)
            tb = jnp.take(mesh.tris_packed, tri_idx, axis=1)  # [9, N] one gather
            t, u, v, ok = _mt_from_packed(origins, dirs, tb[0:3], tb[3:6],
                                          tb[6:9], mode)
            better = valid & ok & (t > MIN_T) & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_tri = jnp.where(better, tri_idx, best_tri)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, left, skip)
        node = jnp.where(live, nxt, -1)
        return node, best_t, best_tri, best_u, best_v

    init = (node0,
            jnp.full((n,), 1e30, jnp.float32),
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32))
    _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, init)
    hit = best_t < 1e30
    return TraceResult(t=best_t, tri=best_tri, u=best_u, v=best_v, hit=hit)


def trace_mesh_brute(mesh, origins, dirs, mode: int = ANY) -> TraceResult:
    """O(N*T) oracle without chunk argmin tricks — ground truth for both
    production paths (SURVEY.md §7)."""
    n = origins.shape[1]
    if mesh.is_empty:
        return _miss(n)
    num_tris = mesh.indices.shape[1]

    def body(i, state):
        best_t, best_tri, best_u, best_v = state
        col = jax.lax.dynamic_slice(mesh.tris_packed, (0, i), (9, 1))
        v0, e1, e2 = col[0:3], col[3:6], col[6:9]
        t, u, v, ok = _mt_from_packed(origins, dirs, v0, e1, e2, mode)
        better = ok & (t > MIN_T) & (t < best_t)
        return (jnp.where(better, t, best_t),
                jnp.where(better, jnp.int32(i), best_tri),
                jnp.where(better, u, best_u),
                jnp.where(better, v, best_v))

    init = (jnp.full((n,), 1e30, jnp.float32), jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))
    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(0, num_tris, body, init)
    return TraceResult(t=best_t, tri=best_tri, u=best_u, v=best_v,
                       hit=best_t < 1e30)

"""Two-level dense ray-mesh intersection for LARGE meshes.

The role OptiX GAS hardware traversal plays for arbitrary-size meshes in the
reference (/root/reference/src/mesh.cu:297-357, rt/optix_programs.cu:139-504),
rebuilt for the TPU's strengths: above DENSE_MAX_TRIANGLES the gather-driven
BVH walk is ~50x slower than dense VPU sweeps (BASELINE.md), so instead of
walking pointers we make the work dense at CLUSTER granularity:

  Level 0 (XLA): triangles sit in BVH-leaf order (mesh_bvh reorder), so
    consecutive CLUSTER_SIZE-triangle chunks are spatially tight; every ray
    slab-tests every cluster AABB (dense [N, C] vector math, C = T/256) and
    the hits are OR-reduced over 512-ray blocks into a per-block cluster
    shortlist of at most SHORTLIST_K ids.

  Level 1 (Pallas): a 2D grid (ray_block, shortlist_slot) where the cluster
    id for each step comes from a SCALAR-PREFETCHED shortlist indexed inside
    the BlockSpec index_map — the block-sparse-matmul scheduling pattern.
    Each live step sweeps one 512-ray block against one 256-triangle cluster
    tile in VMEM (register-tiled Moeller-Trumbore, same math as
    trace_pallas.py); dummy tail slots map to the previous step's tile (no
    DMA) and skip all compute. Output blocks are revisited across the inner
    grid dim and accumulate best-t/tri in VMEM.

  Exactness: blocks whose true cluster count exceeds SHORTLIST_K (rare —
    counts are bounded by scene silhouette complexity, not T) are re-traced
    by the stackless BVH walk with only those rays active; a masked
    while_loop over zero active rays exits immediately, so the fallback is
    ~free unless actually needed. Results are bit-identical to
    trace_mesh_brute modulo FP-contract, like the dense path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLUSTER_SIZE = 256
BLOCK_RAYS = 512
TRI_TILE = 128
SHORTLIST_K = 256        # capacity cap for very large meshes
SHORTLIST_FULL_MAX = 256  # <= this many clusters: shortlist covers ALL of them
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


def _block_cluster_mask(origins, dirs, cluster_bounds, active):
    """[3, Npad] rays (Npad % BLOCK_RAYS == 0) x [6, C] boxes ->
    bool [NB, C]: does any (active) ray of block b enter cluster c.

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

    def body(i, mask):
        blk = jax.lax.dynamic_slice(cb, (0, i * chunk), (6, chunk))
        lo = blk[0:3][:, None, None, :]                    # [3, 1, 1, chunk]
        hi = blk[3:6][:, None, None, :]
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        tmin = jnp.minimum(t0, t1).max(axis=0)             # [NB, R, chunk]
        tmax = jnp.maximum(t0, t1).min(axis=0)
        hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmax > MIN_T)
        if act is not None:
            hit &= act
        return jax.lax.dynamic_update_slice(
            mask, jnp.any(hit, axis=1), (0, i * chunk))

    mask0 = jnp.zeros((nb, cpad), bool)
    mask = jax.lax.fori_loop(0, n_chunks, body, mask0)
    return mask[:, :c]


def shortlist_capacity(c: int) -> int:
    """Static shortlist size for a mesh with c clusters: full coverage when
    it fits (overflow becomes impossible and the BVH-walk fallback
    compiles to a zero-iteration while_loop), else the cap — measured on the
    57.6k-tri incoherent workload, dead grid steps beyond a block's count
    cost ~100 ms per 256k rays at full coverage vs a 29 us/ray walk
    fallback, a 21x win (BASELINE.md round 2)."""
    return c if c <= SHORTLIST_FULL_MAX else SHORTLIST_K


def _shortlists(mask, k=None):
    """mask [NB, C] -> (ids [NB, K] i32, counts [NB] i32, overflow [NB] bool).

    ids holds the first K overlapped cluster indices ascending; dummy tail
    slots repeat the last real id (so consecutive grid steps reuse the same
    VMEM tile and Mosaic skips the DMA)."""
    nb, c = mask.shape
    k = min(SHORTLIST_K, c) if k is None else k
    iota = jax.lax.broadcasted_iota(jnp.int32, (nb, c), 1)
    ranked = jnp.sort(jnp.where(mask, iota, jnp.int32(c)), axis=1)[:, :k]
    counts = jnp.sum(mask, axis=1).astype(jnp.int32)
    overflow = counts > k
    kept = jnp.minimum(counts, k)
    last = jnp.take_along_axis(
        ranked, jnp.clip(kept - 1, 0, k - 1)[:, None], axis=1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    # Dummy slots must still be VALID DMA targets: clamp into [0, c) (an
    # all-empty block's "last real id" is the out-of-range sentinel c).
    ids = jnp.where(slot < kept[:, None], ranked, jnp.clip(last, 0, c - 1))
    return ids.astype(jnp.int32), kept, overflow


# ---------------------------------------------------------------------------
# Level 1: worklist kernel
# ---------------------------------------------------------------------------

def _cluster_kernel(ids_ref, counts_ref, o_ref, d_ref, tri_ref, out_ref, *,
                    mode: int, k: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[0, :] = jnp.full((BLOCK_RAYS,), 1e30, jnp.float32)
        out_ref[1, :] = jnp.zeros((BLOCK_RAYS,), jnp.float32)

    @pl.when(j < counts_ref[i])
    def _sweep():
        cluster = ids_ref[i * k + j]
        ox = o_ref[0, :][:, None]
        oy = o_ref[1, :][:, None]
        oz = o_ref[2, :][:, None]
        dx = d_ref[0, :][:, None]
        dy = d_ref[1, :][:, None]
        dz = d_ref[2, :][:, None]

        best_t = out_ref[0, :]
        best_tri = jax.lax.bitcast_convert_type(out_ref[1, :], jnp.int32)

        for tile in range(CLUSTER_SIZE // TRI_TILE):
            tb = tri_ref[:, pl.ds(tile * TRI_TILE, TRI_TILE)]
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
            ok &= t > TRI_EPSILON

            if mode != 0:
                nx = e1y * e2z - e1z * e2y
                ny = e1z * e2x - e1x * e2z
                nz = e1x * e2y - e1y * e2x
                facing = nx * dx + ny * dy + nz * dz
                if mode == 1:
                    ok &= facing < 0.0
                else:
                    ok &= facing > 0.0

            t = jnp.where(ok & (t > MIN_T), t, 1e30)
            tc = jnp.min(t, axis=1)
            tids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            ci = jnp.min(jnp.where(t <= tc[:, None], tids, TRI_TILE), axis=1)

            better = tc < best_t
            best_t = jnp.where(better, tc, best_t)
            best_tri = jnp.where(
                better, cluster * CLUSTER_SIZE + tile * TRI_TILE + ci,
                best_tri)

        out_ref[0, :] = best_t
        out_ref[1, :] = jax.lax.bitcast_convert_type(best_tri, jnp.float32)


@functools.partial(jax.jit, static_argnames=("mode", "k"))
def trace_clusters_pallas(origins, dirs, tris_packed, ids, counts,
                          mode: int, k: int):
    """origins/dirs [3, Npad]; tris_packed [9, C*CLUSTER_SIZE];
    ids [NB*k] i32 shortlists; counts [NB] i32.
    Returns (best_t [Npad], best_tri [Npad])."""
    n = origins.shape[1]
    nb = n // BLOCK_RAYS
    grid = (nb, k)

    def ray_map(i, j, ids_ref, counts_ref):
        return (0, i)

    def tri_map(i, j, ids_ref, counts_ref):
        return (0, ids_ref[i * k + j])

    out = pl.pallas_call(
        functools.partial(_cluster_kernel, mode=mode, k=k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, BLOCK_RAYS), ray_map),
                pl.BlockSpec((3, BLOCK_RAYS), ray_map),
                pl.BlockSpec((9, CLUSTER_SIZE), tri_map),
            ],
            out_specs=pl.BlockSpec((2, BLOCK_RAYS), ray_map),
        ),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(k) * CLUSTER_SIZE * 45 // 4,
            bytes_accessed=int(n) * 32 + 9 * int(tris_packed.shape[1]) * 4,
            transcendentals=0),
    )(ids, counts, origins, dirs, tris_packed)
    return out[0], jax.lax.bitcast_convert_type(out[1], jnp.int32)

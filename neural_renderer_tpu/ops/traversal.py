"""Batched BVH traversal — the TPU replacement for both the reference's SW
stack-DFS kernel (mesh_traversal.cuh:118-222) and its OptiX HW path.

Design: all rays advance in lockstep through a *stackless threaded DFS*. Each
node stores a skip link (next subtree in DFS order); the traversal state per
ray is just the current node id + best hit, so one loop iteration is a handful
of gathers and [N]-wide vector ops — no per-lane stack, no scatter, fully
uniform control flow. Early-out pruning against the running best-t is kept
(node AABBs are tested with t_max = best_t, exactly like the reference's
`intersectAabb(..., bestPi.t, ...)`).

Layout: vectors are channel-major [3, N] and every gather pulls dense [N]
(or [3, N]) slices — see ops/linalg.py for why lane-padding rules this.

Trade-off vs the CUDA version: we lose near-child-first ordering (the DFS
order is fixed at build time), which costs extra node visits, but every
iteration is dense vector work instead of divergent warp lanes. The loop runs
until the *slowest* ray finishes; rays that are done idle at node == -1.

TraceMode facing culls (FORWARD_ONLY / BACKWARD_ONLY / ANY,
mesh_traversal.cuh:96-111) are compile-time branches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .intersect import _fetch_triangle, intersect_aabb, intersect_triangle
from .linalg import cross, dot

# TraceMode (mesh_traversal.cuh:107-111)
ANY = 0
FORWARD_ONLY = 1
BACKWARD_ONLY = 2

MIN_T = 1e-6  # fixed minimum hit distance (mesh_traversal.cuh:131)


class TraceResult(NamedTuple):
    t: jnp.ndarray        # [N] f32, 1e30 on miss
    tri: jnp.ndarray      # [N] i32 triangle index (reordered leaf order)
    u: jnp.ndarray        # [N] f32 barycentric
    v: jnp.ndarray        # [N] f32 barycentric
    hit: jnp.ndarray      # [N] bool


def _miss(n):
    return TraceResult(
        t=jnp.full((n,), 1e30, jnp.float32),
        tri=jnp.zeros((n,), jnp.int32),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
        hit=jnp.zeros((n,), bool),
    )


def trace_mesh(mesh, origins, dirs, mode: int = ANY,
               active=None) -> TraceResult:
    """Closest-hit trace of [N] rays against one mesh's BVH.

    Args:
      mesh: MeshArrays.
      origins, dirs: [3, N] f32 (channel-major).
      mode: ANY / FORWARD_ONLY / BACKWARD_ONLY (static).
      active: optional [N] bool — inactive rays skip traversal entirely
        (they start at node -1); the masked-lane replacement for CUDA
        stream compaction.
    """
    n = origins.shape[1]
    if mesh.is_empty:
        return _miss(n)

    # Safe reciprocal: avoids 0*inf NaNs in the slab test. CUDA's fminf
    # ignores NaNs (returns the other operand); XLA's min propagates them, so
    # we keep inv_dir finite instead.
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

        bmin = jnp.take(mesh.bvh_bounds_min, nidx, axis=1)  # [3, N]
        bmax = jnp.take(mesh.bvh_bounds_max, nidx, axis=1)
        box_hit, _ = intersect_aabb(origins, inv_dirs, bmin, bmax, best_t)
        box_hit &= live

        is_leaf = jnp.take(mesh.bvh_is_leaf, nidx) != 0
        first = jnp.take(mesh.bvh_first, nidx)
        count = jnp.take(mesh.bvh_count, nidx)

        process = box_hit & is_leaf
        for i in range(max_leaf):
            tri_idx = jnp.clip(first + i, 0, num_tris - 1)
            valid = process & (i < count)
            v0, v1, v2, _ = _fetch_triangle(mesh, tri_idx)

            if mode != ANY:
                tri_n = cross(v1 - v0, v2 - v0)  # unnormalized; sign suffices
                facing = dot(tri_n, dirs)
                if mode == FORWARD_ONLY:
                    valid &= facing < 0.0
                else:  # BACKWARD_ONLY
                    valid &= facing > 0.0

            t, u, v, ok = intersect_triangle(origins, dirs, v0, v1, v2)
            better = valid & ok & (t > MIN_T) & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_tri = jnp.where(better, tri_idx, best_tri)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)

        descend = box_hit & ~is_leaf
        left = jnp.take(mesh.bvh_left, nidx)
        skip = jnp.take(mesh.bvh_skip, nidx)
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
    """O(N*T) oracle: every ray against every triangle (fori over triangles,
    vectorized over rays). Ground truth for the BVH path (SURVEY.md §7)."""
    n = origins.shape[1]
    if mesh.is_empty:
        return _miss(n)
    num_tris = mesh.indices.shape[1]

    def body(i, state):
        best_t, best_tri, best_u, best_v = state
        tri_idx = jnp.full((n,), i, jnp.int32)
        v0, v1, v2, _ = _fetch_triangle(mesh, tri_idx)
        t, u, v, ok = intersect_triangle(origins, dirs, v0, v1, v2)
        if mode != ANY:
            tri_n = cross(v1 - v0, v2 - v0)
            facing = dot(tri_n, dirs)
            if mode == FORWARD_ONLY:
                ok &= facing < 0.0
            else:
                ok &= facing > 0.0
        better = ok & (t > MIN_T) & (t < best_t)
        return (jnp.where(better, t, best_t),
                jnp.where(better, tri_idx, best_tri),
                jnp.where(better, u, best_u),
                jnp.where(better, v, best_v))

    init = (jnp.full((n,), 1e30, jnp.float32), jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32))
    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(0, num_tris, body, init)
    return TraceResult(t=best_t, tri=best_tri, u=best_u, v=best_v,
                       hit=best_t < 1e30)

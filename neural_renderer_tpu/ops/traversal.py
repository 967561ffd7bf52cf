"""Batched BVH traversal — the TPU replacement for both the reference's SW
stack-DFS kernel (mesh_traversal.cuh:118-222) and its OptiX HW path.

Design: all rays advance in lockstep through a *stackless threaded DFS*. Each
node stores a skip link (next subtree in DFS order); the traversal state per
ray is just the current node id + best hit, so one loop iteration is a handful
of gathers and [N]-wide vector ops — no per-lane stack, no scatter, fully
uniform control flow. Early-out pruning against the running best-t is kept
(node AABBs are tested with t_max = best_t, exactly like the reference's
`intersectAabb(..., bestPi.t, ...)`).

Trade-off vs the CUDA version: we lose near-child-first ordering (the DFS
order is fixed at build time), which costs extra node visits, but every
iteration is dense vector work instead of divergent warp lanes. The loop runs
until the *slowest* ray finishes; rays that are done idle at node == -1.

TraceMode facing culls (FORWARD_ONLY / BACKWARD_ONLY / ANY,
mesh_traversal.cuh:96-111) are compile-time branches.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .intersect import intersect_aabb, intersect_triangle
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
      origins, dirs: [N, 3] f32.
      mode: ANY / FORWARD_ONLY / BACKWARD_ONLY (static).
      active: optional [N] bool — inactive rays skip traversal entirely
        (they start at node -1); the masked-lane replacement for CUDA
        stream compaction.
    """
    n = origins.shape[0]
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
    num_tris = mesh.indices.shape[0]

    def cond(state):
        node = state[0]
        return jnp.any(node >= 0)

    def body(state):
        node, best_t, best_tri, best_u, best_v = state
        live = node >= 0
        nidx = jnp.clip(node, 0, num_nodes - 1)

        bmin = jnp.take(mesh.bvh_bounds_min, nidx, axis=0)
        bmax = jnp.take(mesh.bvh_bounds_max, nidx, axis=0)
        box_hit, _ = intersect_aabb(origins, inv_dirs, bmin, bmax, best_t)
        box_hit &= live

        is_leaf = jnp.take(mesh.bvh_is_leaf, nidx) != 0
        first = jnp.take(mesh.bvh_first, nidx)
        count = jnp.take(mesh.bvh_count, nidx)

        process = box_hit & is_leaf
        for i in range(max_leaf):
            tri_idx = jnp.clip(first + i, 0, num_tris - 1)
            valid = process & (i < count)
            idx = jnp.take(mesh.indices, tri_idx, axis=0)
            v0 = jnp.take(mesh.vertices, idx[:, 0], axis=0)
            v1 = jnp.take(mesh.vertices, idx[:, 1], axis=0)
            v2 = jnp.take(mesh.vertices, idx[:, 2], axis=0)

            if mode != ANY:
                tri_n = cross(v1 - v0, v2 - v0)  # unnormalized; sign is enough
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
    """O(N*T) oracle: every ray against every triangle. Used by tests as the
    ground truth for the BVH path (SURVEY.md §7 step 2/3)."""
    n = origins.shape[0]
    if mesh.is_empty:
        return _miss(n)
    idx = mesh.indices  # [T, 3]
    v0 = jnp.take(mesh.vertices, idx[:, 0], axis=0)  # [T, 3]
    v1 = jnp.take(mesh.vertices, idx[:, 1], axis=0)
    v2 = jnp.take(mesh.vertices, idx[:, 2], axis=0)

    def per_ray(o, d):
        t, u, v, ok = intersect_triangle(o[None, :], d[None, :], v0, v1, v2)
        if mode != ANY:
            tri_n = cross(v1 - v0, v2 - v0)
            facing = dot(tri_n, d[None, :])
            if mode == FORWARD_ONLY:
                ok &= facing < 0.0
            else:
                ok &= facing > 0.0
        ok &= t > MIN_T
        t = jnp.where(ok, t, 1e30)
        best = jnp.argmin(t)
        return t[best], best.astype(jnp.int32), u[best], v[best], t[best] < 1e30

    t, tri, u, v, hit = jax.vmap(per_ray)(origins, dirs)
    return TraceResult(t=t, tri=tri, u=u, v=v, hit=hit)

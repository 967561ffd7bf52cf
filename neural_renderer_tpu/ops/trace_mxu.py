"""MXU Möller–Trumbore: pair-wise triple products as one matmul.

Every MT numerator/determinant is a scalar triple product mixing ray vectors
(o, d) and triangle vectors (v0, e1, e2). Triple products are invariant
under cyclic permutation, so each one factors into a BILINEAR form
    <ray features> · <triangle features>:
  det   = e1·(d×e2)            =  d·(e2×e1)
  u·det = (o-v0)·(d×e2)        =  (o×d)·e2     - d·(e2×v0)
  v·det = d·((o-v0)×e1)        = -(o×d)·e1     - d·(v0×e1)
  t·det = e2·((o-v0)×e1)       =  o·(e1×e2)    - e2·(v0×e1)
With ray features F = [d, o, o×d, 1] (K=10, padded to 16 sublanes) and four
triangle feature columns per tile, the whole N×T pair sweep becomes four
[N,16]@[16,T] matmuls on the MXU plus a short VPU epilogue (compare/cull/
min-reduce). The facing sign the TraceMode culls need is free: the oracle's
facing = d·(e1×e2) = -det.

Numerics: features are built in f32 on the VPU (exact); the dots run at
precision=HIGHEST (bf16x6 ≈ f32 on the MXU), so results match the VPU
kernel to ~1 ulp of f32 — close but NOT bit-identical, which is why this
path is opt-in (NR_TRACE_MXU=1) until the TPU A/B in BASELINE.md
(roadmap lever 6) proves the win. Identities verified to 1e-15 in
tests/test_trace_mxu.py; math mirrors ops/intersect.py and the reference's
mesh_intersection.cuh:15-46.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace_pallas import BLOCK_RAYS, MIN_T, TRI_EPSILON, TRI_TILE

RAY_K = 16  # 10 live feature rows, padded to a sublane multiple


def _cross_rows(a, b):
    """Row-wise cross product of [3, ...] arrays."""
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]], axis=0)


def ray_features(origins, dirs):
    """[3, N] x2 -> [RAY_K, N] f32: rows [d | o | o×d | 1 | 0-pad]."""
    n = origins.shape[-1]
    one = jnp.ones((1, n), jnp.float32)
    pad = jnp.zeros((RAY_K - 10, n), jnp.float32)
    return jnp.concatenate(
        [dirs, origins, _cross_rows(origins, dirs), one, pad], axis=0)


def tri_features(tb):
    """[9, T] packed (v0|e1|e2) -> (f_det, f_u, f_v, f_t), each [RAY_K, T].

    Zero-padded triangles produce all-zero features -> det 0 -> culled by
    the epsilon test, like the VPU kernels' padding behavior.
    """
    v0, e1, e2 = tb[0:3], tb[3:6], tb[6:9]
    t = tb.shape[-1]
    z3 = jnp.zeros((3, t), jnp.float32)
    z1 = jnp.zeros((1, t), jnp.float32)
    zp = jnp.zeros((RAY_K - 10, t), jnp.float32)
    v0xe1 = _cross_rows(v0, e1)
    f_det = jnp.concatenate([_cross_rows(e2, e1), z3, z3, z1, zp], axis=0)
    f_u = jnp.concatenate([-_cross_rows(e2, v0), z3, e2, z1, zp], axis=0)
    f_v = jnp.concatenate([-v0xe1, z3, -e1, z1, zp], axis=0)
    s = jnp.sum(e2 * v0xe1, axis=0, keepdims=True)
    f_t = jnp.concatenate([z3, _cross_rows(e1, e2), z3, -s, zp], axis=0)
    return f_det, f_u, f_v, f_t


def pair_eval_raw(F, tb):
    """[RAY_K, N] ray features x [9, T] tile -> (t, ok, det), each [N, T].
    `ok` carries every cull except the facing modes; facing = -det, so
    callers apply TraceMode (or dual-facing splits) from det's sign."""
    f_det, f_u, f_v, f_t = tri_features(tb)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    det = dot(F, f_det)
    u_num = dot(F, f_u)
    v_num = dot(F, f_v)
    t_num = dot(F, f_t)

    ok = jnp.abs(det) >= TRI_EPSILON
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    u = u_num * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)
    v = v_num * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = t_num * inv_det
    ok &= t > TRI_EPSILON
    return t, ok, det


def _pair_eval(F, tb, mode: int):
    """[RAY_K, N] ray features x [9, T] tile -> (t [N, T], ok [N, T])."""
    t, ok, det = pair_eval_raw(F, tb)
    if mode == 1:    # FORWARD_ONLY: facing = -det < 0
        ok &= det > 0.0
    elif mode == 2:  # BACKWARD_ONLY
        ok &= det < 0.0
    return t, ok


def _mxu_kernel(o_ref, d_ref, tri_ref, out_ref, *, mode: int,
                num_tiles: int):
    F = ray_features(o_ref[:, :], d_ref[:, :])  # [RAY_K, BLOCK_RAYS]

    def tile(c, state):
        best_t, best_tri = state
        tb = tri_ref[:, pl.ds(c * TRI_TILE, TRI_TILE)]
        t, ok = _pair_eval(F, tb, mode)
        t = jnp.where(ok & (t > MIN_T), t, 1e30)
        tc = jnp.min(t, axis=1)
        ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        ci = jnp.min(jnp.where(t <= tc[:, None], ids, TRI_TILE), axis=1)
        better = tc < best_t
        best_t = jnp.where(better, tc, best_t)
        best_tri = jnp.where(better, c * TRI_TILE + ci, best_tri)
        return best_t, best_tri

    init = (jnp.full((BLOCK_RAYS,), 1e30, jnp.float32),
            jnp.zeros((BLOCK_RAYS,), jnp.int32))
    best_t, best_tri = jax.lax.fori_loop(0, num_tiles, tile, init)
    out_ref[0, :] = best_t
    out_ref[1, :] = jax.lax.bitcast_convert_type(best_tri, jnp.float32)


@functools.partial(jax.jit, static_argnames=("mode", "num_tiles",
                                              "interpret"))
def trace_dense_mxu_pallas(origins, dirs, tris_packed, mode: int,
                           num_tiles: int, interpret: bool = False):
    """Drop-in for trace_pallas.trace_dense_pallas (same contract):
    origins/dirs [3, Npad], tris_packed [9, num_tiles*TRI_TILE] ->
    (best_t [Npad], best_tri [Npad]). `interpret` runs the kernel body in
    Pallas interpret mode — the CPU validation path for kernel logic."""
    n = origins.shape[1]
    t_total = tris_packed.shape[1]
    grid = (n // BLOCK_RAYS,)

    out = pl.pallas_call(
        functools.partial(_mxu_kernel, mode=mode, num_tiles=num_tiles),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((3, BLOCK_RAYS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_RAYS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, t_total), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, BLOCK_RAYS), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(n) * int(t_total) * 2 * 4 * RAY_K,
            bytes_accessed=int(n) * 32 + 9 * int(t_total) * 4,
            transcendentals=0),
    )(origins, dirs, tris_packed)
    return out[0], jax.lax.bitcast_convert_type(out[1], jnp.int32)


def trace_dense_mxu_xla(origins, dirs, tris_packed, mode: int):
    """XLA twin of the MXU formulation (CPU oracle path for tests):
    one-shot [N, T] pair matrix — small inputs only."""
    F = ray_features(origins, dirs)
    t, ok = _pair_eval(F, tris_packed, mode)
    t = jnp.where(ok & (t > MIN_T), t, 1e30)
    best_t = jnp.min(t, axis=1)
    best_tri = jnp.argmin(t, axis=1).astype(jnp.int32)
    return best_t, best_tri

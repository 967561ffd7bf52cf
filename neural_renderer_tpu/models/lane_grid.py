"""Lane-local multiresolution hash grid — the TPU-native encoding variant.

Why this exists: the tcnn-compatible hash grid (encoding.py) costs 192 XLA
gathers per network call (3 points x 8 levels x 8 corners) at ~3 ns/index on
this hardware — measured 473 ns/ray, the single largest cost in the neural
frame (BASELINE.md). XLA's gather is per-index; Mosaic/Pallas TPU exposes a
much cheaper primitive instead: `tpu.dynamic_gather` — a same-shape,
within-vreg shuffle along lanes (128-entry lookup per op) or sublanes.

This grid is DESIGNED around that primitive (not a tcnn port — compare
/root/reference/src/cuda_renderer_neural.cu:1647-1675, which leans on the
GPU's arbitrary-address HBM gathers):

  * Each (point, level, feature) combo owns an independent table of
    S x 128 entries, stored as an [S, 128] block: the LOW 7 hash bits select
    a lane, the next log2(S) bits select a sublane row.
  * A Pallas kernel (ops/lane_grid_kernel.py) keeps every table VMEM-resident
    and does per-corner lookups with ONE broadcast-row lane-gather per
    sublane row: `take_along_axis(broadcast(T[s]), lane_idx, axis=-1)`,
    masked by `sub_idx == s`. The 8 trilinear corners ride the 8 sublanes of
    one vreg, so a corner lookup for 128 rays is a single vector op.
  * Hash: the same coherent prime xor tcnn uses ({1, 2654435761, 805459861},
    grid.h) — only the table geometry changes, masked to S*128 entries.
    All levels hash (no dense special case).

This file holds the pure-JAX twin: the differentiable oracle used for
training and on CPU (tests, multi-chip dry runs). The Pallas kernel is
bit-compatible with it (same hash, same accumulation order) and is parity
tested.

Parameter layout: ONE array [P, L, F, S, 128] float32 — flattened to
[P*L*F*S, 128] for the kernel. Feature order (must match the MLP input
column order): point-major, then level, then feature; SH(16) appended by the
caller (models/nbvh.py encode ordering).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

# tcnn grid.h coherent prime hash, as wrapped int32 (multiplication and xor
# only depend on the low 32 bits, so int32 arithmetic reproduces uint32).
PRIME_X = 1
PRIME_Y = -1640531535   # 2654435761 as int32
PRIME_Z = 805459861

LANES = 128


def level_scale(level: int, base_resolution: int, per_level_scale: float) -> float:
    """tcnn grid scale: 2^(l*log2(pls)) * base - 1 (encoding.py semantics)."""
    return (2.0 ** (level * math.log2(per_level_scale))
            * base_resolution - 1.0)


def hash_corner(cx, cy, cz, n_entries: int):
    """int32 corner coords -> table index in [0, n_entries). n_entries must
    be a power of two. Wrapping int32 arithmetic == uint32 low bits."""
    h = (cx * jnp.int32(PRIME_X)
         ^ cy * jnp.int32(PRIME_Y)
         ^ cz * jnp.int32(PRIME_Z))
    return h & jnp.int32(n_entries - 1)


def init_lane_tables(key, n_points: int, n_levels: int, n_features: int,
                     sublanes: int, entry_pack: int = 1, dtype=jnp.float32):
    """Uniform(-1e-4, 1e-4) like tcnn's grid init.

    entry_pack=1: [P, L, F, S, 128] (one f32 entry per lane).
    entry_pack=2: [P, L, F, S, 2, 128] — at inference the fused kernel packs
    the two bf16-rounded entries of each lane pair into ONE f32 lane, so the
    table capacity doubles at the exact same gather count (the reference's
    tcnn grid stores FP16 entries too, cuda_renderer_neural.cu:1691-1702).
    Training and the XLA twin keep full f32 masters.
    """
    shape = (n_points, n_levels, n_features, sublanes, LANES) \
        if entry_pack == 1 else \
        (n_points, n_levels, n_features, sublanes, entry_pack, LANES)
    return jax.random.uniform(key, shape, minval=-1e-4, maxval=1e-4,
                              dtype=dtype)


# ---------------------------------------------------------------------------
# Corner lookup-sum with an MXU-friendly table gradient
# ---------------------------------------------------------------------------
# Plain autodiff of `sum_c take(T, idx_c) * w_c` transposes the gather into
# an XLA scatter-add — measured as ~44 of the 45 ms training step at B=16k
# (per-index column-window scatters; scripts/profile_train_backward.py). The
# table entry index decomposes as e = row * 128 + lane, so the gradient
#   dT[f, e] = sum_{c,n} g[f,n] * w[c,n] * [idx[c,n] == e]
# factors into a LANE one-hot (128-wide, the vreg lane dimension) and a ROW
# mask (R = E/128 wide):
#   A[(r,f), (c,n)] = g[f,n] * w[c,n] * [row[c,n] == r]      (VPU build, bf16)
#   dT[(r,f), lane] = A @ OH_lane[(c,n), lane]               (ONE MXU matmul)
# With R*F = 128 rows (S=16, pack=2, F=4) the matmul runs on full MXU tiles
# instead of M=4 slivers (a plain [F,E] one-hot matmul measured only 1.8x the
# scatter; scripts/bench_table_grad.py). Weight/position gradients keep exact
# autodiff: w8 is computed outside, and dw uses the saved corner values.


_GRAD_CHUNK = 16384  # rays per backward matmul chunk (A is [R*F, 8*chunk] bf16)


@functools.lru_cache(maxsize=None)
def _make_corner_lookup_sum(f_dim: int, e_dim: int, dtype_name: str):
    r_dim = e_dim // LANES
    tdtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def lookup(table_fe, idx8, w8):
        acc = 0.0
        for c in range(8):
            acc = acc + jnp.take(table_fe, idx8[c], axis=1) * w8[c][None, :]
        return acc

    def fwd(table_fe, idx8, w8):
        v8 = jnp.stack([jnp.take(table_fe, idx8[c], axis=1)
                        for c in range(8)])
        out = jnp.sum(v8 * w8[:, None, :], axis=0)
        return out, (idx8, w8, v8)

    def bwd(res, g):
        idx8, w8, v8 = res
        n = idx8.shape[1]
        lane = (idx8 & (LANES - 1)).astype(jnp.int32)
        row = (idx8 >> 7).astype(jnp.int32)
        gw = (g[:, None, :] * w8[None, :, :]).astype(jnp.bfloat16)  # [F,8,N]
        rows_iota = jnp.arange(r_dim, dtype=jnp.int32)
        lanes_iota = jnp.arange(LANES, dtype=jnp.int32)

        chunk = min(_GRAD_CHUNK, n)
        num_chunks = -(-n // chunk)
        padded = num_chunks * chunk
        if padded != n:
            lane = jnp.pad(lane, ((0, 0), (0, padded - n)))
            row = jnp.pad(row, ((0, 0), (0, padded - n)), constant_values=-1)
            gw = jnp.pad(gw, ((0, 0), (0, 0), (0, padded - n)))

        def body(i, dt2):
            sl = jax.lax.dynamic_slice_in_dim
            lane_c = sl(lane, i * chunk, chunk, axis=1)       # [8, chunk]
            row_c = sl(row, i * chunk, chunk, axis=1)
            gw_c = sl(gw, i * chunk, chunk, axis=2)           # [F, 8, chunk]
            rowmask = (row_c[None] == rows_iota[:, None, None])
            a = (rowmask[:, None].astype(jnp.bfloat16)
                 * gw_c[None]).reshape(r_dim * f_dim, 8 * chunk)
            oh = (lane_c.reshape(-1)[:, None]
                  == lanes_iota[None, :]).astype(jnp.bfloat16)
            return dt2 + jax.lax.dot(a, oh,
                                     preferred_element_type=jnp.float32)

        dt2 = jax.lax.fori_loop(
            0, num_chunks, body,
            jnp.zeros((r_dim * f_dim, LANES), jnp.float32))
        d_table = dt2.reshape(r_dim, f_dim, LANES).transpose(1, 0, 2) \
            .reshape(f_dim, e_dim).astype(tdtype)
        dw = jnp.einsum("cfn,fn->cn", v8, g)
        d_idx = np.zeros(idx8.shape, dtype=jax.dtypes.float0)
        return d_table, d_idx, dw

    lookup.defvjp(fwd, bwd)
    return lookup


def _corner_lookup_sum(table_fe, idx8, w8):
    """[F, E] table, [8, N] int32 corner indices, [8, N] f32 weights ->
    [F, N] = sum_c take(table, idx8[c], axis=1) * w8[c]."""
    f_dim, e_dim = table_fe.shape
    return _make_corner_lookup_sum(f_dim, e_dim,
                                   jnp.dtype(table_fe.dtype).name)(
        table_fe, idx8, w8)


def lane_encode_point_features(tables_p, x, base_resolution: int,
                               per_level_scale: float):
    """Encode ONE point through its per-point tables (XLA twin).

    tables_p: [L, F, S, 128] or [L, F, S, pack, 128]; x: [3, N] in [0, 1].
    Returns a list of L*F arrays [N] (level-major, feature within level) —
    the same contract as encoding.hashgrid_encode_features. The flat entry
    index decomposes as sub*(pack*128) + half*128 + lane, which is exactly
    the row-major flatten of the trailing table axes, so both layouts share
    this code path.
    """
    n_levels, n_features = tables_p.shape[:2]
    n_entries = math.prod(tables_p.shape[2:])
    outs = []
    for level in range(n_levels):
        scale = jnp.float32(level_scale(level, base_resolution, per_level_scale))
        p = x * scale + 0.5
        corner = jnp.floor(p)
        w = p - corner
        c0 = corner.astype(jnp.int32)

        table_fe = tables_p[level].reshape(n_features, n_entries)
        idx_list, w_list = [], []
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    idx_list.append(hash_corner(c0[0] + dx, c0[1] + dy,
                                                c0[2] + dz, n_entries))
                    wx = w[0] if dx else (1.0 - w[0])
                    wy = w[1] if dy else (1.0 - w[1])
                    wz = w[2] if dz else (1.0 - w[2])
                    w_list.append(wx * wy * wz)
        acc = _corner_lookup_sum(table_fe, jnp.stack(idx_list),
                                 jnp.stack(w_list))
        outs.extend(acc[f] for f in range(n_features))
    return outs


def lane_encode_features(tables, inputs, base_resolution: int,
                         per_level_scale: float):
    """All points. tables: [P, L, F, S, 128]; inputs: [3P(+...), N]
    channel-major, point p at rows [3p, 3p+3). Returns list of P*L*F [N]."""
    n_points = tables.shape[0]
    feats = []
    for p in range(n_points):
        feats.extend(lane_encode_point_features(
            tables[p], inputs[p * 3:(p + 1) * 3],
            base_resolution, per_level_scale))
    return feats

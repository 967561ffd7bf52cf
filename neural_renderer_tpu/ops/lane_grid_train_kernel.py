"""Fused training step for the lane-grid shell network: Pallas forward AND
backward.

Why: the XLA training path costs ~565 ns/segment forward (192 per-index HBM
gathers) plus ~535 ns/segment backward (scatter-add transposes / materialized
one-hot matmuls) — training ran ~100x slower than the fused inference
forward (BASELINE.md round 3; scripts/profile_train_backward.py). The
reference never trains at all (tcnn inference_mixed_precision only,
cuda_renderer_neural.cu:2031); this kernel pair is the TPU-native training
story to match its inference one.

Design:
  * forward: the existing fused kernel (ops/lane_grid_kernel.py) in TRAIN
    table layout — full-f32 entries addressed as (row = idx >> 7, lane), no
    bf16 pair-packing, so gradients are exact w.r.t. the f32 master tables.
  * backward: ONE Pallas kernel per 128-ray block that RECOMPUTES the
    forward (rematerialization — cheaper than storing activations: the whole
    forward is ~37 ns/ray) and accumulates, across the sequential grid:
      - MLP weight grads as [<=128,128] @ [128,128] MXU matmuls,
      - table grads per (point, level) as ONE transpose-free masked one-hot
        matmul: A[(f,row), (c,ray)] = dfeat_f * w_c * [subrow match] against
        OHT[lane, (c,ray)] = [lane match], contracted over (c,ray) — both
        operands build in their natural sublane/lane layout (no in-kernel
        transposes; the (row, lane) split of the entry index is the same
        trick as models/lane_grid._make_corner_lookup_sum, but VMEM-resident
        instead of HBM-materialized).
    All grad accumulators live in VMEM across grid steps (~1.6 MB tables +
    ~0.3 MB MLP); outputs are written once.

Gradients flow to PARAMETERS ONLY: the input cotangent is returned as zeros
(training samples inputs from the dataset — nothing differentiates through
them; the XLA twin remains the fully differentiable oracle).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import lane_grid, nbvh
from ..models.encoding import sh_encode_features
from .lane_grid_kernel import LANES, _forward_padded, _round_up, \
    pack_lane_weights


def _train_tables2d(tables):
    """Master tables -> [P*L*F*rows, 128] f32 rows, rows = S * pack (the
    pack axis folds into the sublane-row index: entry = row * 128 + lane,
    matching the XLA twin's row-major flatten)."""
    if tables.ndim == 6:
        p_, l_, f_, s_, pk, lanes = tables.shape
        rows = s_ * pk
    else:
        p_, l_, f_, s_, lanes = tables.shape
        rows = s_
    return tables.reshape(p_ * l_ * f_ * rows, lanes).astype(jnp.float32), rows


def _encode_feats_and_h(x, tables_ref, cfg_s):
    """Recompute the encode for one [12, 128] block (train layout):
    returns (feats list of [1,128] rows, h_enc [in_pad, 128] f32)."""
    (n_points, n_levels, n_features, rows, base_resolution, per_level_scale,
     in_pad) = cfg_s
    corner = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    dx = (corner & 1).astype(jnp.float32)
    dy = ((corner >> 1) & 1).astype(jnp.float32)
    dz = ((corner >> 2) & 1).astype(jnp.float32)
    n_entries = rows * LANES

    feats = []
    for p in range(n_points):
        px = x[3 * p:3 * p + 1, :]
        py = x[3 * p + 1:3 * p + 2, :]
        pz = x[3 * p + 2:3 * p + 3, :]
        for level in range(n_levels):
            scale = jnp.float32(lane_grid.level_scale(
                level, base_resolution, per_level_scale))
            sx = px * scale + 0.5
            sy = py * scale + 0.5
            sz = pz * scale + 0.5
            cx0 = jnp.floor(sx)
            cy0 = jnp.floor(sy)
            cz0 = jnp.floor(sz)
            wx = sx - cx0
            wy = sy - cy0
            wz = sz - cz0
            cx = cx0.astype(jnp.int32) + (corner & 1)
            cy = cy0.astype(jnp.int32) + ((corner >> 1) & 1)
            cz = cz0.astype(jnp.int32) + ((corner >> 2) & 1)
            wc = ((dx * wx + (1.0 - dx) * (1.0 - wx))
                  * (dy * wy + (1.0 - dy) * (1.0 - wy))
                  * (dz * wz + (1.0 - dz) * (1.0 - wz)))
            idx = lane_grid.hash_corner(cx, cy, cz, n_entries)
            sub = idx >> 7
            lane = idx & (LANES - 1)

            accs = [jnp.zeros((8, LANES), jnp.float32)
                    for _ in range(n_features)]
            base_row = (p * n_levels + level) * n_features * rows
            for s in range(rows):
                mw = jnp.where(sub == s, wc, 0.0)
                for f in range(n_features):
                    trow = jnp.broadcast_to(
                        tables_ref[base_row + f * rows + s:
                                   base_row + f * rows + s + 1, :],
                        (8, LANES))
                    g = jnp.take_along_axis(trow, lane, axis=-1)
                    accs[f] = accs[f] + g * mw
            for f in range(n_features):
                feats.append(jnp.sum(accs[f], axis=0, keepdims=True))

    all_rows = list(feats)
    all_rows.extend(f.reshape(1, LANES) for f in
                    sh_encode_features(x[3 * n_points:3 * n_points + 3, :]))
    h = jnp.concatenate(all_rows, axis=0)
    pad = in_pad - h.shape[0]
    if pad:
        h = jnp.concatenate([h, jnp.zeros((pad, LANES), jnp.float32)], axis=0)
    return h


def _bwd_kernel(x_ref, g_ref, tables_ref, w0_ref, w1_ref, w2_ref, w3_ref,
                wout_ref, dt_ref, dw0_ref, dw1_ref, dw2_ref, dw3_ref,
                dwout_ref, *, n_points, n_levels, n_features, rows,
                base_resolution, per_level_scale, in_pad):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dt_ref[:] = jnp.zeros_like(dt_ref)
        dw0_ref[:] = jnp.zeros_like(dw0_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dw3_ref[:] = jnp.zeros_like(dw3_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)

    cfg_s = (n_points, n_levels, n_features, rows, base_resolution,
             per_level_scale, in_pad)
    x = x_ref[:]
    h_enc = _encode_feats_and_h(x, tables_ref, cfg_s)

    prec = jax.lax.Precision.DEFAULT

    def mm(a, b):  # a @ b with f32 accumulation
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=prec)

    def mm_t(a, b):  # a @ b.T (contract both dim 1) with f32 accumulation
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def mm_tt(a, b):  # a.T @ b (contract both dim 0) with f32 accumulation
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    # Forward MLP, retaining bf16 activations + LeakyReLU masks.
    h_list = [h_enc.astype(jnp.bfloat16)]
    masks = []
    h = h_list[0]
    for w_ref in (w0_ref, w1_ref, w2_ref, w3_ref):
        a = mm(w_ref[:], h)
        masks.append(a > 0)
        a = jnp.where(a > 0, a, nbvh.LEAKY_SLOPE * a)
        h = a.astype(jnp.bfloat16)
        h_list.append(h)

    # Backward MLP.
    g = g_ref[:].astype(jnp.bfloat16)                      # [out_dims, 128]
    dwout_ref[:] += mm_t(g, h_list[4])
    delta = mm_tt(wout_ref[:], g)                          # [128, 128] f32
    for li, (w_ref, dw_ref) in zip(
            (3, 2, 1, 0),
            ((w3_ref, dw3_ref), (w2_ref, dw2_ref), (w1_ref, dw1_ref),
             (w0_ref, dw0_ref))):
        delta = jnp.where(masks[li], delta, nbvh.LEAKY_SLOPE * delta)
        db = delta.astype(jnp.bfloat16)
        dw_ref[:] += mm_t(db, h_list[li])
        delta = mm_tt(w_ref[:], db)
    d_enc = delta                                          # [in_pad, 128] f32

    # Table grads: per (point, level), transpose-free masked one-hot matmul.
    corner = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    fdx = (corner & 1).astype(jnp.float32)
    fdy = ((corner >> 1) & 1).astype(jnp.float32)
    fdz = ((corner >> 2) & 1).astype(jnp.float32)
    n_entries = rows * LANES
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    iota_lanes = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    for p in range(n_points):
        px = x[3 * p:3 * p + 1, :]
        py = x[3 * p + 1:3 * p + 2, :]
        pz = x[3 * p + 2:3 * p + 3, :]
        for level in range(n_levels):
            scale = jnp.float32(lane_grid.level_scale(
                level, base_resolution, per_level_scale))
            sx = px * scale + 0.5
            sy = py * scale + 0.5
            sz = pz * scale + 0.5
            cx0 = jnp.floor(sx)
            cy0 = jnp.floor(sy)
            cz0 = jnp.floor(sz)
            wx = sx - cx0
            wy = sy - cy0
            wz = sz - cz0
            cx = cx0.astype(jnp.int32) + (corner & 1)
            cy = cy0.astype(jnp.int32) + ((corner >> 1) & 1)
            cz = cz0.astype(jnp.int32) + ((corner >> 2) & 1)
            wc = ((fdx * wx + (1.0 - fdx) * (1.0 - wx))
                  * (fdy * wy + (1.0 - fdy) * (1.0 - wy))
                  * (fdz * wz + (1.0 - fdz) * (1.0 - wz)))    # [8, 128]
            idx = lane_grid.hash_corner(cx, cy, cz, n_entries)
            sub = idx >> 7                                    # [8, 128]
            lane = idx & (LANES - 1)

            pl_i = p * n_levels + level
            a_blocks = []   # axis-1 concat over corners
            oh_blocks = []
            for c in range(8):
                sub_c = jnp.broadcast_to(sub[c:c + 1, :], (rows, LANES))
                rowmask = (iota_rows == sub_c).astype(jnp.float32)
                lane_c = jnp.broadcast_to(lane[c:c + 1, :], (LANES, LANES))
                oh_blocks.append(
                    (iota_lanes == lane_c).astype(jnp.bfloat16))
                f_blocks = []
                for f in range(n_features):
                    dfeat = d_enc[pl_i * n_features + f:
                                  pl_i * n_features + f + 1, :]  # [1, 128]
                    f_blocks.append(rowmask * (dfeat * wc[c:c + 1, :]))
                a_blocks.append(
                    jnp.concatenate(f_blocks, axis=0).astype(jnp.bfloat16))
            a_full = jnp.concatenate(a_blocks, axis=1)   # [F*rows, 8*128]
            oht = jnp.concatenate(oh_blocks, axis=1)     # [128, 8*128]
            dt_pl = mm_t(a_full, oht)                    # [F*rows, 128] f32
            base = pl_i * n_features * rows
            dt_ref[base:base + n_features * rows, :] += dt_pl


@functools.partial(
    jax.jit,
    static_argnames=("n_points", "n_levels", "n_features", "rows",
                     "base_resolution", "per_level_scale", "in_pad",
                     "out_dims", "interpret"))
def _backward_padded(x_pad, g_pad, tables2d, w0, w1, w2, w3, wout, *,
                     n_points, n_levels, n_features, rows, base_resolution,
                     per_level_scale, in_pad, out_dims, interpret):
    n = x_pad.shape[1]
    grid = (n // LANES,)
    kernel = functools.partial(
        _bwd_kernel, n_points=n_points, n_levels=n_levels,
        n_features=n_features, rows=rows, base_resolution=base_resolution,
        per_level_scale=per_level_scale, in_pad=in_pad)

    def col_map(i):
        return (0, i)

    def pinned(i):
        return (0, 0)

    width = w0.shape[0]
    t_rows = tables2d.shape[0]
    out_shapes = [
        jax.ShapeDtypeStruct((t_rows, LANES), jnp.float32),      # d_tables
        jax.ShapeDtypeStruct((width, in_pad), jnp.float32),      # d_w0
        jax.ShapeDtypeStruct((width, width), jnp.float32),
        jax.ShapeDtypeStruct((width, width), jnp.float32),
        jax.ShapeDtypeStruct((width, width), jnp.float32),
        jax.ShapeDtypeStruct((out_dims, width), jnp.float32),    # d_wout
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((x_pad.shape[0], LANES), col_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_dims, LANES), col_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tables2d.shape, pinned, memory_space=pltpu.VMEM),
            pl.BlockSpec((width, in_pad), pinned, memory_space=pltpu.VMEM),
            pl.BlockSpec((width, width), pinned, memory_space=pltpu.VMEM),
            pl.BlockSpec((width, width), pinned, memory_space=pltpu.VMEM),
            pl.BlockSpec((width, width), pinned, memory_space=pltpu.VMEM),
            pl.BlockSpec((out_dims, width), pinned, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_rows, LANES), pinned),
            pl.BlockSpec((width, in_pad), pinned),
            pl.BlockSpec((width, width), pinned),
            pl.BlockSpec((width, width), pinned),
            pl.BlockSpec((width, width), pinned),
            pl.BlockSpec((out_dims, width), pinned),
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(x_pad, g_pad, tables2d, w0, w1, w2, w3, wout)


@functools.lru_cache(maxsize=None)
def _make_apply_train(config: nbvh.NbvhConfig, interpret: bool):
    """custom-vjp fused network apply for training. Returns f(params, x)
    -> [padded_out, N] f32. Parameter grads only (input cotangent = zeros)."""
    assert config.grid_type == "lane"
    width = config.mlp_width
    in_pad = _round_up(config.encoded_dims, width)

    def fwd_only(params, inputs):
        n = inputs.shape[1]
        npad = _round_up(max(n, LANES), LANES)
        x = inputs if npad == n else jnp.pad(inputs,
                                             ((0, 0), (0, npad - n)))
        tables2d, rows = _train_tables2d(params["lane"])
        w0, w1, w2, w3, wout = pack_lane_weights(params, config)
        block_mask = jnp.ones((npad // LANES,), jnp.int32)
        out = _forward_padded(
            x.astype(jnp.float32), block_mask, tables2d, w0, w1, w2, w3,
            wout, n_points=config.point_count, n_levels=config.n_levels,
            n_features=config.n_features, sublanes=rows, entry_pack=1,
            base_resolution=config.base_resolution,
            per_level_scale=config.per_level_scale,
            encoded_dims=config.encoded_dims,
            out_dims=config.padded_output_dims, interpret=interpret)
        return out[:, :n]

    @jax.custom_vjp
    def apply_train(params, inputs):
        return fwd_only(params, inputs)

    def vjp_fwd(params, inputs):
        return fwd_only(params, inputs), (params, inputs)

    def vjp_bwd(res, g):
        params, inputs = res
        n = inputs.shape[1]
        npad = _round_up(max(n, LANES), LANES)
        x = inputs if npad == n else jnp.pad(inputs, ((0, 0), (0, npad - n)))
        gp = g if npad == n else jnp.pad(g, ((0, 0), (0, npad - n)))
        tables2d, rows = _train_tables2d(params["lane"])
        w0, w1, w2, w3, wout = pack_lane_weights(params, config)
        dt, dw0, dw1, dw2, dw3, dwout = _backward_padded(
            x.astype(jnp.float32), gp.astype(jnp.float32), tables2d,
            w0, w1, w2, w3, wout,
            n_points=config.point_count, n_levels=config.n_levels,
            n_features=config.n_features, rows=rows,
            base_resolution=config.base_resolution,
            per_level_scale=config.per_level_scale, in_pad=in_pad,
            out_dims=config.padded_output_dims, interpret=interpret)
        d_lane = dt.reshape(params["lane"].shape).astype(params["lane"].dtype)
        mlp_shapes = params["mlp"]
        d_mlp = [dw0[:, :mlp_shapes[0].shape[1]].astype(mlp_shapes[0].dtype),
                 dw1.astype(mlp_shapes[1].dtype),
                 dw2.astype(mlp_shapes[2].dtype),
                 dw3.astype(mlp_shapes[3].dtype),
                 dwout.astype(mlp_shapes[4].dtype)]
        d_params = {"lane": d_lane, "mlp": d_mlp}
        # Inputs are dataset samples — nothing differentiates through them.
        d_inputs = jnp.zeros_like(inputs)
        return d_params, d_inputs

    apply_train.defvjp(vjp_fwd, vjp_bwd)
    return apply_train


def apply_train_fused(params, inputs, config: nbvh.NbvhConfig,
                      interpret: bool = False):
    """Training forward with fused Pallas forward AND backward.

    Semantics match nbvh.apply(..., compute_dtype=bf16) within bf16 MXU
    rounding; gradients flow to PARAMETERS ONLY (input cotangents are zero —
    the trainer's inputs are sampled data; use the XLA twin if you need
    input gradients). MLP weight grads are w.r.t. the bf16-cast weights
    (mixed-precision training; masters stay f32 in the optimizer)."""
    return _make_apply_train(config, interpret)(params, inputs)

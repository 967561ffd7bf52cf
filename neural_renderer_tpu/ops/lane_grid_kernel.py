"""Fully fused shell-network forward for the lane-local hash grid.

ONE Pallas kernel runs the entire network — hash encode + SH + 4-layer MLP —
for a 128-ray block per grid step, with every parameter VMEM-resident:

  inputs [12, N] channel-major  ->  outputs [16, N] channel-major

This is the TPU answer to tcnn's fused HashGrid+SH+MLP inference
(/root/reference/src/cuda_renderer_neural.cu:1647-1702, 2025-2032), built
around what the hardware actually gives us instead of translating the CUDA:

  * Corner lookups: the 8 trilinear corners of a sample ride the 8 SUBLANES
    of one vreg while 128 rays ride the lanes, so hashing + gathering a
    corner batch is single vector ops. Table rows are looked up with
    `take_along_axis(broadcast(T[s]), lane_idx, axis=-1)` — Mosaic's
    within-vreg dynamic_gather — masked by the sublane-row id, S rows per
    table (models/lane_grid.py layout).
  * The MLP runs TRANSPOSED (out = W @ h, channel-major [width, 128-rays])
    so the encode output feeds the MXU with no transposes and the kernel
    output is already the [16, N] layout the shell march consumes
    (render/neural_march.py). Weights are the original [out, in] matrices,
    zero-padded, bf16, pinned in VMEM across all grid steps.
  * No HBM intermediates: encodes never materialize (the tcnn pipeline and
    our tcnn-compatible path both round-trip [N, 112] features through HBM).

Parity: bit-compatible hash/weights with the XLA twin
(lane_grid.lane_encode_features); the only tolerated drift is the corner
summation order (sequential in the twin, sublane tree-reduce here) and bf16
MXU rounding shared with the tcnn path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import lane_grid, nbvh
from ..models.encoding import sh_encode_features

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _encode_block(x, tables_ref, *, n_points, n_levels, n_features, sublanes,
                  entry_pack, base_resolution, per_level_scale):
    """x: [12, 128] block. Returns list of P*L*F feature rows [1, 128] f32.

    entry_pack=2: each f32 table lane holds TWO bf16-rounded entries (low 16
    bits = entry half 0, high 16 = half 1) — bit 7 of the hash index selects
    the half after the lane-gather, doubling table capacity at the same
    gather count. bf16 entries are in-family with the reference's FP16 tcnn
    tables (cuda_renderer_neural.cu:1691-1702)."""
    corner = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    dx = corner & 1
    dy = (corner >> 1) & 1
    dz = (corner >> 2) & 1
    fdx = dx.astype(jnp.float32)
    fdy = dy.astype(jnp.float32)
    fdz = dz.astype(jnp.float32)
    n_entries = sublanes * entry_pack * LANES
    sub_shift = 7 + (entry_pack.bit_length() - 1)

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

            cx = cx0.astype(jnp.int32) + dx          # [8, 128]
            cy = cy0.astype(jnp.int32) + dy
            cz = cz0.astype(jnp.int32) + dz
            # Trilinear corner weights, one corner per sublane.
            wcx = fdx * wx + (1.0 - fdx) * (1.0 - wx)
            wcy = fdy * wy + (1.0 - fdy) * (1.0 - wy)
            wcz = fdz * wz + (1.0 - fdz) * (1.0 - wz)
            wc = wcx * wcy * wcz                      # [8, 128]

            idx = lane_grid.hash_corner(cx, cy, cz, n_entries)
            sub = idx >> sub_shift
            lane = idx & (LANES - 1)
            if entry_pack == 2:
                hi_half = (idx & jnp.int32(LANES)) != 0

            accs = [jnp.zeros((8, LANES), jnp.float32)
                    for _ in range(n_features)]
            base_row = (p * n_levels + level) * n_features * sublanes
            for s in range(sublanes):
                mw = jnp.where(sub == s, wc, 0.0)
                for f in range(n_features):
                    row = base_row + f * sublanes + s
                    trow = jnp.broadcast_to(tables_ref[row:row + 1, :],
                                            (8, LANES))
                    g = jnp.take_along_axis(trow, lane, axis=-1)
                    if entry_pack == 2:
                        u = jax.lax.bitcast_convert_type(g, jnp.int32)
                        vlo = jax.lax.bitcast_convert_type(
                            u << 16, jnp.float32)
                        vhi = jax.lax.bitcast_convert_type(
                            u & jnp.int32(-65536), jnp.float32)
                        g = jnp.where(hi_half, vhi, vlo)
                    accs[f] = accs[f] + g * mw
            for f in range(n_features):
                feats.append(jnp.sum(accs[f], axis=0, keepdims=True))
    return feats


def _forward_kernel(mask_ref, x_ref, tables_ref, w0_ref, w1_ref, w2_ref,
                    w3_ref, wout_ref, out_ref, *, n_points, n_levels,
                    n_features, sublanes, entry_pack, base_resolution,
                    per_level_scale, encoded_dims):
    # Per-block activity skip: a block with no active ray writes zeros and
    # skips encode + MLP entirely — zero data movement, unlike compaction
    # (whose scatter-back cost killed two attempts, BASELINE.md). The camera
    # march's peeled iteration 1 runs the network full-batch with only the
    # entry-active rays (~1/3) mattering; compacted-tier tail blocks past
    # `count` are likewise all-dead.
    i = pl.program_id(0)

    @pl.when(mask_ref[i] == 0)
    def _dead():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(mask_ref[i] != 0)
    def _live():
        x = x_ref[:]
        feats = _encode_block(
            x, tables_ref, n_points=n_points, n_levels=n_levels,
            n_features=n_features, sublanes=sublanes, entry_pack=entry_pack,
            base_resolution=base_resolution, per_level_scale=per_level_scale)
        feats.extend(f.reshape(1, LANES) for f in
                     sh_encode_features(x[3 * n_points:3 * n_points + 3, :]))
        # [encoded_dims(=112), 128] -> zero-pad rows to the MLP width.
        h = jnp.concatenate(feats, axis=0)
        pad = w0_ref.shape[1] - encoded_dims
        if pad:
            h = jnp.concatenate(
                [h, jnp.zeros((pad, LANES), jnp.float32)], axis=0)

        # Transposed MLP: h stays channel-major [width, rays]; weights
        # [out, in]. DEFAULT precision: a global 'highest' would request an
        # f32-contract bf16 matmul Mosaic cannot lower.
        prec = jax.lax.Precision.DEFAULT
        h = h.astype(jnp.bfloat16)
        for w_ref in (w0_ref, w1_ref, w2_ref, w3_ref):
            a = jnp.dot(w_ref[:], h, preferred_element_type=jnp.float32,
                        precision=prec)
            a = jnp.where(a > 0, a, nbvh.LEAKY_SLOPE * a)
            h = a.astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(wout_ref[:], h,
                             preferred_element_type=jnp.float32,
                             precision=prec)


def pack_lane_weights(params, config: nbvh.NbvhConfig, dtype=jnp.bfloat16):
    """MLP [out, in] matrices -> zero-padded VMEM blocks (kept [out, in]:
    the kernel multiplies W @ h in channel-major space)."""
    width = config.mlp_width
    mats = []
    for i, w in enumerate(params["mlp"][:-1]):
        pad_in = _round_up(w.shape[1], width) - w.shape[1]
        mats.append(jnp.pad(w.astype(dtype), ((0, 0), (0, pad_in))))
    mats.append(params["mlp"][-1].astype(dtype))  # [padded_out, width]
    return mats


@functools.partial(
    jax.jit,
    static_argnames=("n_points", "n_levels", "n_features", "sublanes",
                     "entry_pack", "base_resolution", "per_level_scale",
                     "encoded_dims", "out_dims", "interpret"))
def _forward_padded(x_pad, block_mask, tables2d, w0, w1, w2, w3, wout, *,
                    n_points, n_levels, n_features, sublanes, entry_pack,
                    base_resolution, per_level_scale, encoded_dims, out_dims,
                    interpret):
    n = x_pad.shape[1]
    grid = (n // LANES,)
    kernel = functools.partial(
        _forward_kernel, n_points=n_points, n_levels=n_levels,
        n_features=n_features, sublanes=sublanes, entry_pack=entry_pack,
        base_resolution=base_resolution, per_level_scale=per_level_scale,
        encoded_dims=encoded_dims)

    def col_map(i, mask_ref):
        return (0, i)

    def pinned(i, mask_ref):
        return (0, 0)

    width = w0.shape[0]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((x_pad.shape[0], LANES), col_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(tables2d.shape, pinned,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((width, width), pinned,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((width, width), pinned,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((width, width), pinned,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((width, width), pinned,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_dims, width), pinned,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((out_dims, LANES), col_map),
        ),
        out_shape=jax.ShapeDtypeStruct((out_dims, n), jnp.float32),
        interpret=interpret,
    )(block_mask, x_pad, tables2d, w0, w1, w2, w3, wout)


def forward_lane(params, inputs, config: nbvh.NbvhConfig,
                 interpret: bool = False, active=None):
    """Full network forward via the fused kernel. inputs [12, N]
    channel-major -> [padded_output_dims, N] f32. Inference only (training
    differentiates the XLA twin, mirroring the reference where tcnn
    inference_mixed_precision is likewise inference-only).

    `active` ([N] bool, optional) enables the per-block skip: 128-ray blocks
    with no active ray output zeros without running encode/MLP. Callers must
    mask those lanes out downstream (the shell march already does)."""
    assert config.grid_type == "lane"
    n = inputs.shape[1]
    npad = _round_up(max(n, LANES), LANES)
    x = inputs if npad == n else jnp.pad(inputs, ((0, 0), (0, npad - n)))
    if active is None:
        block_mask = jnp.ones((npad // LANES,), jnp.int32)
    else:
        apad = active if npad == n else jnp.pad(active, (0, npad - n))
        block_mask = jnp.any(apad.reshape(npad // LANES, LANES),
                             axis=1).astype(jnp.int32)

    tables = params["lane"]
    if tables.ndim == 6:
        # Packed layout [P, L, F, S, 2, 128]: quantize each entry to bf16
        # and pack the lane pair into one f32 (half 0 -> low 16 bits).
        p_, l_, f_, s_, pk, lanes = tables.shape
        assert pk == 2, "lane_entry_pack must be 1 or 2"
        u = jax.lax.bitcast_convert_type(
            tables.astype(jnp.float32).astype(jnp.bfloat16),
            jnp.uint16).astype(jnp.uint32)
        packed = (u[..., 1, :] << 16) | u[..., 0, :]
        tables2d = jax.lax.bitcast_convert_type(
            packed, jnp.float32).reshape(p_ * l_ * f_ * s_, lanes)
        entry_pack = 2
    else:
        p_, l_, f_, s_, lanes = tables.shape
        tables2d = tables.reshape(p_ * l_ * f_ * s_, lanes).astype(jnp.float32)
        entry_pack = 1
    w0, w1, w2, w3, wout = pack_lane_weights(params, config)
    out = _forward_padded(
        x.astype(jnp.float32), block_mask, tables2d, w0, w1, w2, w3, wout,
        n_points=config.point_count, n_levels=config.n_levels,
        n_features=config.n_features, sublanes=s_, entry_pack=entry_pack,
        base_resolution=config.base_resolution,
        per_level_scale=config.per_level_scale,
        encoded_dims=config.encoded_dims,
        out_dims=config.padded_output_dims, interpret=interpret)
    return out[:, :n]

"""Multi-chip parallelism: tile data-parallel rendering + DP/TP training.

The reference is single-GPU with no distributed layer (SURVEY.md §2.4); this
is the first-class TPU scaling story designed in its place:

  * Rendering: horizontal pixel-stripe data parallelism via `shard_map` over
    a 1D mesh — each chip renders its stripe with GLOBAL pixel ids (identical
    RNG streams to a single-chip render), the image is assembled by the
    all-gather XLA inserts for the stacked output. Collectives ride ICI only.
  * Training: batch sharded over 'dp', network tensor-sharded over 'tp'
    (hash-grid tables sharded on the entry axis, MLP hidden matrices on the
    width axis) via NamedSharding annotations — XLA/GSPMD inserts the
    psum/all-gathers (the scaling-book recipe: pick a mesh, annotate, let the
    compiler place collectives).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import pathtrace


def make_mesh(devices=None, dp: int | None = None, tp: int = 1,
              axis_names=("dp", "tp")) -> Mesh:
    """Build a (dp, tp) device mesh; dp defaults to n_devices // tp."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp <= n, f"need {dp * tp} devices, have {n}"
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names)


# ---------------------------------------------------------------------------
# Tile data-parallel rendering
# ---------------------------------------------------------------------------

def render_gt_frame_tiled(mesh_arrays, env, params, accum, mesh: Mesh,
                          axis: str = "dp", return_guides: bool = False):
    """Ground-truth frame with pixel rows sharded across `axis`.

    accum: [3, H*W] channel-major (replicated or sharded — resharded as
    needed). Returns (image_u8 [H, W, 3], new_accum [3, H*W]) with the stripe
    all-gather inserted by XLA. return_guides additionally yields the
    denoiser guide buffers (normals, albedo) as row-sharded [3, H, W]."""
    n_shards = mesh.shape[axis]
    h, w = params.height, params.width
    assert h % n_shards == 0, f"height {h} not divisible by {n_shards} shards"
    rows_per = h // n_shards

    accum_img = accum.reshape(3, h, w)
    guide_spec = (P(None, axis, None), P(None, axis, None))

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(), P(), P(None, axis, None)),
             out_specs=((P(axis, None, None), P(None, axis, None)) +
                        (guide_spec if return_guides else ())))
    def shard_fn(mesh_a, env_a, params_a, accum_shard):
        row0 = jax.lax.axis_index(axis) * rows_per
        out = pathtrace.render_gt_frame(
            mesh_a, env_a, params_a, accum_shard.reshape(3, -1),
            row0=row0, n_rows=rows_per, return_guides=return_guides)
        if return_guides:
            img, acc, (gn, ga) = out
            return img, acc.reshape(3, rows_per, w), gn, ga
        img, acc = out
        return img, acc.reshape(3, rows_per, w)

    out = shard_fn(mesh_arrays, env, params, accum_img)
    if return_guides:
        img, acc, gn, ga = out
        return img, acc.reshape(3, -1), (gn, ga)
    img, acc = out
    return img, acc.reshape(3, -1)


def render_neural_frame_tiled(ctx, additional_mesh, env, params, accum,
                              mesh: Mesh, axis: str = "dp",
                              use_additional: bool = False,
                              compute_dtype=jnp.bfloat16,
                              return_guides: bool = False):
    """NEURAL frame (shell march + bounces) with pixel rows sharded across
    `axis` — the flagship path's multi-chip story. Global pixel-id RNG makes
    the stripe render bit-identical to the single-chip frame; shell meshes
    and network weights are replicated (they're small), pixels are the DP
    axis, and the only collective is the output all-gather XLA inserts.
    return_guides additionally yields the denoiser guide buffers (normals,
    albedo) as row-sharded [3, H, W] for bilateral_denoise_tiled."""
    n_shards = mesh.shape[axis]
    h, w = params.height, params.width
    assert h % n_shards == 0, f"height {h} not divisible by {n_shards} shards"
    rows_per = h // n_shards

    accum_img = accum.reshape(3, h, w)
    guide_spec = (P(None, axis, None), P(None, axis, None))

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(), P(), P(), P(None, axis, None)),
             out_specs=((P(axis, None, None), P(None, axis, None)) +
                        (guide_spec if return_guides else ())))
    def shard_fn(ctx_a, add_a, env_a, params_a, accum_shard):
        row0 = jax.lax.axis_index(axis) * rows_per
        from ..render.neural_frame import render_neural_frame
        out = render_neural_frame(
            ctx_a, add_a, env_a, params_a, accum_shard.reshape(3, -1),
            use_additional=use_additional, compute_dtype=compute_dtype,
            row0=row0, n_rows=rows_per, return_guides=return_guides)
        if return_guides:
            img, acc, (gn, ga) = out
            return img, acc.reshape(3, rows_per, w), gn, ga
        img, acc = out
        return img, acc.reshape(3, rows_per, w)

    out = shard_fn(ctx, additional_mesh, env, params, accum_img)
    if return_guides:
        img, acc, gn, ga = out
        return img, acc.reshape(3, -1), (gn, ga)
    img, acc = out
    return img, acc.reshape(3, -1)


def bilateral_denoise_tiled(accum, accum_count, guide_normals, guide_albedo,
                            mesh: Mesh, axis: str = "dp"):
    """Joint bilateral denoiser with pixel rows sharded across `axis`
    (VERDICT r3 item 8 — the last frame mode excluded from the tiled path).

    The 11x11 stencil (radius r=5, denoiser.cuh:31-34 parameters) needs r
    rows of context above and below each stripe: every shard exchanges its
    edge rows with its row-neighbors via TWO `ppermute`s (one per direction,
    riding ICI) — color, guide normals, guide albedo and a validity row are
    concatenated into one [10, r, W] message per direction so each halo is a
    single collective. Boundary shards receive zeros (ppermute's unpaired
    default) with validity 0, which is exactly the whole-frame border
    clipping, so the tiled result is the same stencil math per pixel as the
    single-device `bilateral_denoise`.

    accum/guides: [3, H, W]; returns the denoised u8 image [H, W, 3]."""
    from ..ops.denoise import DENOISE_RADIUS as R
    from ..ops.denoise import _bilateral_core
    from ..ops.srgb import encode_srgb_u8

    n_shards = mesh.shape[axis]
    _, h, w = accum.shape
    assert h % n_shards == 0, f"height {h} not divisible by {n_shards} shards"
    rows_per = h // n_shards
    assert rows_per >= R, f"stripe rows {rows_per} < stencil radius {R}"
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(None, axis, None), P(), P(None, axis, None),
                       P(None, axis, None)),
             out_specs=P(axis, None, None))
    def shard_fn(acc_s, count, nrm_s, alb_s):
        color = acc_s / jnp.maximum(1.0, count)
        valid = jnp.ones((1, rows_per, w), color.dtype)
        stack = jnp.concatenate([color, nrm_s, alb_s, valid], axis=0)
        halo_up = jax.lax.ppermute(stack[:, -R:, :], axis, fwd)
        halo_dn = jax.lax.ppermute(stack[:, :R, :], axis, bwd)
        ext = jnp.concatenate([halo_up, stack, halo_dn], axis=1)
        ext = jnp.pad(ext, ((0, 0), (0, 0), (R, R)))
        out = _bilateral_core(ext[0:3], ext[3:6], ext[6:9], ext[9],
                              rows_per, w)
        return encode_srgb_u8(out).transpose(1, 2, 0)

    return shard_fn(accum, accum_count, guide_normals, guide_albedo)


def psnr_tiled(ref_u8, test_u8, mesh: Mesh, axis: str = "dp"):
    """Distributed PSNR: per-shard squared-error sums reduced with psum —
    the metric-reduction collective pattern (SURVEY.md §2.4)."""
    h = ref_u8.shape[0]
    n_shards = mesh.shape[axis]
    assert h % n_shards == 0

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(axis, None, None), P(axis, None, None)),
             out_specs=P())
    def sse(r, t):
        d = r.astype(jnp.float64) - t.astype(jnp.float64)
        local = jnp.sum(jnp.sum(d * d, axis=-1) / 3.0)
        return jax.lax.psum(local[None], axis)[0]

    total = sse(ref_u8, test_u8)
    count = ref_u8.shape[0] * ref_u8.shape[1]
    mse = total / count
    return jnp.where(mse < 1e-10, 100.0,
                     10.0 * jnp.log10((255.0 * 255.0) / mse))


# ---------------------------------------------------------------------------
# DP/TP training shardings
# ---------------------------------------------------------------------------

def shard_params_spec(params) -> dict:
    """PartitionSpecs for the network pytree: hash-grid tables sharded on the
    entry axis over 'tp'; MLP hidden matrices sharded on the width axis."""
    def grid_spec(table):
        # [entries, features]: entries is large (16k) and divisible by tp.
        return P("tp", None)

    def mlp_spec(i, w, n_layers):
        if i == 0:
            return P("tp", None)        # [width, enc] row-sharded
        if i == n_layers - 1:
            return P(None, "tp")        # [out, width] col-sharded
        return P("tp", None)            # hidden [width, width]

    n_layers = len(params["mlp"])
    spec = {
        "mlp": [mlp_spec(i, w, n_layers) for i, w in enumerate(params["mlp"])],
    }
    if "lane" in params:
        # Lane grid [P, L, F, S, (pack,) 128]: shard the sublane-row axis
        # over 'tp' (lane_sublanes is a power of two >= tp in practice).
        spec["lane"] = P(*([None, None, None, "tp"]
                           + [None] * (params["lane"].ndim - 4)))
    else:
        spec["grids"] = [[grid_spec(t) for t in grid]
                         for grid in params["grids"]]
    return spec


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState: params per shard_params_spec ('tp'-sharded tables
    and matrices), optimizer state and step replicated. GSPMD propagates the
    param shardings through the step (Adam moments come back sharded)."""
    pspec = shard_params_spec(state.params)
    param_shardings = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), pspec,
        is_leaf=lambda x: isinstance(x, P))
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state.params, param_shardings)
    replicated = NamedSharding(mesh, P())
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated), state.opt_state)
    step = jax.device_put(state.step, replicated)
    return state._replace(params=params, opt_state=opt_state, step=step)


def dp_shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Shard a SegmentBatch's batch axis across `axis` (channel-major
    layout: the batch axis is the LAST axis of 2D leaves)."""
    def place(x):
        spec = P(axis) if x.ndim == 1 else P(*([None] * (x.ndim - 1)), axis)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, batch)


def constrain_batch_dp(batch, mesh: Mesh, axis: str = "dp"):
    """In-jit twin of dp_shard_batch: annotate a traced SegmentBatch with the
    dp sharding via with_sharding_constraint, so a step that SAMPLES its
    batch on-device (train/trainer.py make_train_step) partitions the
    sampling + loss across `axis` instead of leaving GSPMD to guess."""
    def place(x):
        spec = P(axis) if x.ndim == 1 else P(*([None] * (x.ndim - 1)), axis)
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, batch)

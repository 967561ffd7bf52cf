"""Multi-segment shell march: the neural intersection query.

Re-architects traceNeuralSegmentsForRays
(/root/reference/src/cuda_renderer_neural.cu:1810-2083, call stack SURVEY.md
§3.3) for XLA: the reference's compact -> trace -> batch-MLP -> apply -> march
loop with a per-iteration GPU->CPU activeCount readback becomes a
`lax.while_loop` with an on-device `any(active)` condition and masked lanes —
zero host syncs, at most kMaxSegmentIterations (=10) trips, and the loop exits
early once every ray has resolved. The network runs on the full (masked) ray
batch per iteration; XLA keeps everything fused in one program.

All vector state is channel-major [3, N] (ops/linalg.py layout note).

Stages inside one iteration (reference kernels in parens):
  1. segment exits: outer BACKWARD_ONLY + inner ANY  (traceSegmentExitsKernel)
  2. normalized inputs [entry|exit|mid|dir01]        (buildSegmentNeuralInputs)
  3. fused hash-encode + MLP forward                 (tcnn inference)
  4. presence/distance/normal application            (applySegmentNeuralOutput)
  5. re-entry trace + accumT update                  (prepareNextIteration)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..models import nbvh
from ..ops import traversal
from ..ops.linalg import safe_normalize, splat, vec3, where3
from ..scene.materials import P_METALLIC, P_ROUGHNESS, P_SPECULAR
from .pathtrace import HitState

MAX_SEGMENT_ITERATIONS = 10   # cuda_renderer_neural.cu:714
SEGMENT_EPSILON = 1e-8        # cuda_renderer_neural.cu:715


@jax.tree_util.register_dataclass
@dataclass
class NeuralContext:
    """Everything the shell march needs: shell meshes + network weights."""
    outer: object               # MeshArrays
    inner: object               # MeshArrays
    net_params: object          # nbvh params pytree
    config: nbvh.NbvhConfig = field(metadata=dict(static=True),
                                    default=nbvh.NbvhConfig())


def _shell_entry_camera(outer, origins, dirs):
    """traceOuterShellEntryKernel (:720-767)."""
    res = traversal.trace_mesh(outer, origins, dirs, traversal.FORWARD_ONLY)
    entry_pos = origins + dirs * res.t[None, :]
    active = res.hit
    accum_t = jnp.where(active, res.t, 0.0)
    entry_pos = where3(active, entry_pos, jnp.zeros_like(entry_pos))
    return entry_pos, active, accum_t


def _shell_entry_from_rays(outer, origins, dirs, ray_active, pdfs):
    """traceOuterShellEntryFromRaysKernel (:773-852): rays starting inside
    the outer shell first exit (BACKWARD_ONLY) then re-enter."""
    ok = ray_active & (pdfs > 0.0)
    res_fwd = traversal.trace_mesh(outer, origins, dirs,
                                   traversal.FORWARD_ONLY, active=ok)
    need_restart = ok & ~res_fwd.hit
    res_back = traversal.trace_mesh(outer, origins, dirs,
                                    traversal.BACKWARD_ONLY, active=need_restart)
    base_offset = jnp.where(need_restart & res_back.hit,
                            res_back.t + SEGMENT_EPSILON, 0.0)
    shifted_origin = origins + dirs * base_offset[None, :]
    res_retry = traversal.trace_mesh(outer, shifted_origin, dirs,
                                     traversal.FORWARD_ONLY,
                                     active=need_restart & res_back.hit)

    hit = ok & (res_fwd.hit | res_retry.hit)
    entry_t = jnp.where(res_fwd.hit, res_fwd.t, res_retry.t)
    entry_origin = where3(res_fwd.hit, origins, shifted_origin)
    entry_pos = entry_origin + dirs * entry_t[None, :]
    total_t = jnp.where(res_fwd.hit, entry_t, base_offset + entry_t)

    entry_pos = where3(hit, entry_pos, jnp.zeros_like(entry_pos))
    accum_t = jnp.where(hit, total_t, 0.0)
    return entry_pos, hit, accum_t


def trace_neural_segments(ctx: NeuralContext, params, origins, dirs,
                          ray_active=None, pdfs=None,
                          camera_rays: bool = True,
                          compute_dtype=jnp.bfloat16,
                          compaction: bool | None = None,
                          entry=None) -> HitState:
    """Full multi-segment march; returns a HitState over [N] rays.

    `params` is the RenderParams block (material/constant-color settings,
    outer-shell normalization bounds). `ray_active`/`pdfs` gate bounce rays
    like the reference's rayActiveMask/rayPdfs. `entry` optionally supplies a
    precomputed (entry_pos, active, accum_t) — the fused bounce stage
    (bounce_shell_entry_and_early_term) provides it from its shell sweep.
    """
    n = origins.shape[1]

    if entry is not None:
        entry_pos, active, accum_t = entry
    elif camera_rays:
        entry_pos, active, accum_t = _shell_entry_camera(ctx.outer, origins, dirs)
    else:
        ray_active = jnp.ones(n, bool) if ray_active is None else ray_active
        pdfs = jnp.ones(n, jnp.float32) if pdfs is None else pdfs
        entry_pos, active, accum_t = _shell_entry_from_rays(
            ctx.outer, origins, dirs, ray_active, pdfs)

    zero3 = jnp.zeros((3, n), jnp.float32)
    out_hit = HitState(
        position=zero3, normal=zero3, albedo=zero3,
        material_params=zero3,
        hit=jnp.zeros(n, bool), distance=jnp.zeros(n, jnp.float32))

    def segment_step(dirs_b, entry_b, active_b, accum_b):
        """One march iteration over an arbitrary ray batch [*, K].

        Returns (found, hit_pos, normal, color, distance, new_active,
        new_entry, new_accum). Runs on the full batch OR on a compacted
        prefix (the TPU replacement for compactInputsKernel,
        cuda_renderer_neural.cu:1529-1541).
        """
        k = dirs_b.shape[1]
        outer_min = params.outer_shell_min[:, None]
        inv_extent = params.outer_shell_inv_extent[:, None]

        # 1. Segment exits (traceSegmentExitsKernel :858-930): ONE fused
        # sweep over both shells replaces the separate outer-BACKWARD and
        # inner-ANY traces (inner ANY == min of its fwd/bwd closest hits).
        shifted_entry = entry_b + dirs_b * SEGMENT_EPSILON
        sw = traversal.sweep_shells(ctx.outer, ctx.inner, shifted_entry, dirs_b)
        exit_hit = active_b & (sw.outer_bwd < 1e30)
        exit_t = jnp.where(exit_hit, sw.outer_bwd, SEGMENT_EPSILON)
        inner_any = jnp.minimum(sw.inner_fwd, sw.inner_bwd)
        inner_hit = active_b & (inner_any < 1e30)
        inner_t = jnp.where(inner_hit, inner_any, 1e30)
        inner_before = inner_hit & (inner_t < exit_t)
        seg_t = jnp.where(inner_before, inner_t, exit_t)
        exit_pos = shifted_entry + dirs_b * seg_t[None, :]

        # 2. Network inputs (buildSegmentNeuralInputsKernel :937-1001).
        norm_entry = (shifted_entry - outer_min) * inv_extent
        norm_exit = (exit_pos - outer_min) * inv_extent
        mid = 0.5 * (shifted_entry + exit_pos)
        norm_mid = (mid - outer_min) * inv_extent
        dir01 = (dirs_b + 1.0) * 0.5
        net_in = jnp.concatenate([norm_entry, norm_exit, norm_mid, dir01],
                                 axis=0)  # [12, K]

        # 3. Fused encode + MLP (tcnn inference, :2025-2032).
        outputs = nbvh.apply(ctx.net_params, net_in, ctx.config,
                             compute_dtype=compute_dtype,
                             use_kernel=True)  # [16, K]; inference-only path

        # 4. Apply outputs (applySegmentNeuralOutputKernel :1007-1123).
        presence = outputs[0]
        distance = outputs[1]
        normal_raw = outputs[2:5]
        color_raw = jnp.clip(outputs[5:8], 0.0, 1.0)

        neural_hit = presence >= 0.0
        found = active_b & (neural_hit | inner_before)

        clamped = jnp.where(inner_t > 0.0,
                            jnp.minimum(distance, inner_t - SEGMENT_EPSILON),
                            distance)
        hit_pos = shifted_entry + dirs_b * clamped[None, :]
        normal = safe_normalize(normal_raw, min_len=1e-6)

        # outputStride >= 8 is always true (padded width 16), so the
        # reference's material-base-color fallback branch is unreachable:
        # constant color when requested, else the network's color slots.
        color = jnp.where(params.use_constant_neural_color,
                          splat(params.constant_neural_color, k), color_raw)

        # 5. Prepare next iteration (prepareNextIterationKernel :1456-1524).
        still = active_b & ~found
        shifted_exit = exit_pos + dirs_b * SEGMENT_EPSILON
        res_re = traversal.trace_mesh(ctx.outer, shifted_exit, dirs_b,
                                      traversal.FORWARD_ONLY, active=still)
        can_continue = still & (res_re.hit | inner_hit)
        reentry_t = jnp.where(res_re.hit, res_re.t, 0.0)
        new_entry = shifted_exit + dirs_b * reentry_t[None, :]
        new_entry = where3(can_continue, new_entry, entry_b)
        new_accum = jnp.where(
            can_continue, accum_b + exit_t + reentry_t + 2.0 * SEGMENT_EPSILON,
            accum_b)
        return (found, hit_pos, normal, color, distance, can_continue,
                new_entry, new_accum)

    mat_params_row = vec3(
        jnp.broadcast_to(params.material_row[P_METALLIC], (n,)),
        jnp.broadcast_to(params.material_row[P_ROUGHNESS], (n,)),
        jnp.broadcast_to(params.material_row[P_SPECULAR], (n,)))

    def merge_out(out, found, hit_pos, normal, color, distance):
        return HitState(
            position=where3(found, hit_pos, out.position),
            normal=where3(found, normal, out.normal),
            albedo=where3(found, color, out.albedo),
            material_params=where3(found, mat_params_row, out.material_params),
            hit=out.hit | found,
            distance=jnp.where(found, distance, out.distance),
        )

    # Compaction capacity: when the active count fits, the iteration runs on
    # a gathered prefix of this static size instead of the full batch.
    k_cap = max(512, n // 8)
    k_cap = min(k_cap, n)
    use_compaction = (n >= 4096) if compaction is None else bool(compaction)

    def cond(state):
        it, active, *_ = state
        return (it < MAX_SEGMENT_ITERATIONS) & jnp.any(active)

    def body(state):
        (it, active, entry_pos, accum_t, out) = state

        def full_branch(operand):
            active, entry_pos, accum_t, out = operand
            (found, hit_pos, normal, color, distance, new_active, new_entry,
             new_accum) = segment_step(dirs, entry_pos, active, accum_t)
            out = merge_out(out, found, hit_pos, normal, color, distance)
            return new_active, new_entry, new_accum, out

        def compact_branch(operand, k_cap):
            active, entry_pos, accum_t, out = operand
            count = jnp.sum(active.astype(jnp.int32))
            # Out-of-range fill + mode='drop' scatters make padding slots
            # inert; gathers clip (the clipped reads are discarded).
            (idx,) = jnp.nonzero(active, size=k_cap, fill_value=n)
            slot = jax.lax.broadcasted_iota(jnp.int32, (k_cap, 1), 0)[:, 0]
            valid = slot < count

            dirs_k = jnp.take(dirs, idx, axis=1, mode="clip")
            entry_k = jnp.take(entry_pos, idx, axis=1, mode="clip")
            accum_k = jnp.take(accum_t, idx, mode="clip")

            (found, hit_pos, normal, color, distance, new_active, new_entry,
             new_accum) = segment_step(dirs_k, entry_k, valid, accum_k)
            found &= valid
            new_active &= valid

            out = HitState(
                position=out.position.at[:, idx].set(
                    where3(found, hit_pos,
                           jnp.take(out.position, idx, axis=1, mode="clip")),
                    mode="drop"),
                normal=out.normal.at[:, idx].set(
                    where3(found, normal,
                           jnp.take(out.normal, idx, axis=1, mode="clip")),
                    mode="drop"),
                albedo=out.albedo.at[:, idx].set(
                    where3(found, color,
                           jnp.take(out.albedo, idx, axis=1, mode="clip")),
                    mode="drop"),
                material_params=out.material_params.at[:, idx].set(
                    where3(found, jnp.take(mat_params_row, idx, axis=1, mode="clip"),
                           jnp.take(out.material_params, idx, axis=1, mode="clip")),
                    mode="drop"),
                hit=out.hit.at[idx].set(
                    jnp.take(out.hit, idx, mode="clip") | found, mode="drop"),
                distance=out.distance.at[idx].set(
                    jnp.where(found, distance,
                              jnp.take(out.distance, idx, mode="clip")),
                    mode="drop"),
            )
            active2 = active.at[idx].set(new_active, mode="drop")
            entry2 = entry_pos.at[:, idx].set(new_entry, mode="drop")
            accum2 = accum_t.at[idx].set(new_accum, mode="drop")
            return active2, entry2, accum2, out

        operand = (active, entry_pos, accum_t, out)
        if use_compaction:
            import functools
            count = jnp.sum(active.astype(jnp.int32))
            # Two capacity tiers: later march iterations usually carry <1% of
            # rays, so the small tier pays ~1/64 of the full-batch cost.
            k_small = max(512, min(k_cap, n // 64))
            active, entry_pos, accum_t, out = jax.lax.cond(
                count <= k_small,
                functools.partial(compact_branch, k_cap=k_small),
                lambda op: jax.lax.cond(
                    count <= k_cap,
                    functools.partial(compact_branch, k_cap=k_cap),
                    full_branch, op),
                operand)
        else:
            active, entry_pos, accum_t, out = full_branch(operand)

        return (it + 1, active, entry_pos, accum_t, out)

    state = (jnp.int32(0), active, entry_pos, accum_t, out_hit)
    _, _, _, _, out_hit = jax.lax.while_loop(cond, body, state)
    return out_hit


def bounce_shell_entry_and_early_term(ctx: NeuralContext, rays, path_active):
    """Fused bounce-stage shell work: checkBounceEarlyTerminationKernel
    (cuda_renderer_neural.cu:503-553) + traceOuterShellEntryFromRaysKernel
    (:773-852) share their ray origins, so ONE shell sweep serves both —
    replacing four facing-culled traces with a single dense pass (plus a
    mostly-inactive retry trace for rays that start inside the shell).

    Returns (active, (entry_pos, entry_hit, accum_t)); the tuple feeds
    trace_neural_segments(entry=...).
    """
    sw = traversal.sweep_shells(ctx.outer, ctx.inner, rays.origin,
                                rays.direction)
    outer_any = jnp.minimum(sw.outer_fwd, sw.outer_bwd)
    inner_any = jnp.minimum(sw.inner_fwd, sw.inner_bwd)

    # Early termination: kill a path whose bounce ray re-enters the shell
    # volume (inner shell hit before outer).
    check = path_active & (rays.pdf > 0.0) & (rays.distance > 0.0)
    kill = check & (inner_any < 1e30) & (outer_any < 1e30) & \
        (inner_any < outer_any)
    active = path_active & ~kill

    # Shell entry from arbitrary rays; rays starting inside the outer shell
    # first exit (BACKWARD) then re-enter via the masked retry trace.
    ok = active & (rays.pdf > 0.0)
    fwd_hit = ok & (sw.outer_fwd < 1e30)
    need_restart = ok & ~fwd_hit
    bwd_hit = sw.outer_bwd < 1e30
    base_offset = jnp.where(need_restart & bwd_hit,
                            sw.outer_bwd + SEGMENT_EPSILON, 0.0)
    shifted_origin = rays.origin + rays.direction * base_offset[None, :]
    res_retry = traversal.trace_mesh(ctx.outer, shifted_origin, rays.direction,
                                     traversal.FORWARD_ONLY,
                                     active=need_restart & bwd_hit)

    hit = ok & (fwd_hit | res_retry.hit)
    entry_t = jnp.where(fwd_hit, sw.outer_fwd, res_retry.t)
    entry_origin = where3(fwd_hit, rays.origin, shifted_origin)
    entry_pos = entry_origin + rays.direction * entry_t[None, :]
    total_t = jnp.where(fwd_hit, entry_t, base_offset + entry_t)

    entry_pos = where3(hit, entry_pos, jnp.zeros_like(entry_pos))
    accum_t = jnp.where(hit, total_t, 0.0)
    return active, (entry_pos, hit, accum_t)


def check_bounce_early_termination(outer, inner, params, rays, path_active):
    """checkBounceEarlyTerminationKernel (cuda_renderer_neural.cu:503-553):
    kill a bounce path when, along the bounce ray, the inner shell is hit
    before the outer shell (the ray re-enters the shell volume from a neural
    hit point). Returns the updated active mask."""
    check = path_active & (rays.pdf > 0.0) & (rays.distance > 0.0)
    res_outer = traversal.trace_mesh(outer, rays.origin, rays.direction,
                                     traversal.ANY, active=check)
    res_inner = traversal.trace_mesh(inner, rays.origin, rays.direction,
                                     traversal.ANY, active=check)
    kill = check & res_inner.hit & res_outer.hit & (res_inner.t < res_outer.t)
    return path_active & ~kill

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

# Camera-entry strategy (A/B, see BASELINE.md):
#   "fwd2"  — ONE dual-shell sweep with second-forward tracking serves shell
#             entry + a full-batch peeled iteration 1 (measured 21.5 ms
#             @130k rays vs 29.4 for entry-trace + full-batch iteration 1).
#   "trace" — plain FORWARD entry trace (early-out kernel, outer mesh only),
#             then iteration 1 flows through the compaction ladder like any
#             other: on typical scenes only ~25% of camera rays hit the
#             outer shell, so the n/2 tier runs the iteration-1 sweep AND
#             network forward on a quarter of the batch, with none of the
#             fwd2 sweep's ~2x cost or crossing-derivation fix-ups.
import os as _os

CAMERA_ENTRY_DEFAULT = _os.environ.get("NR_CAMERA_ENTRY", "fwd2")

# Inside-start re-entry ("restart") strategy for shell entry from arbitrary
# rays (traceOuterShellEntryFromRaysKernel, cuda_renderer_neural.cu:823-832):
#   "derive" (default) — skip the re-entry trace entirely. A ray needs the
#       restart only when its FORWARD trace from the origin missed; but every
#       forward-facing crossing the shifted-origin retry could find lies at
#       absolute t > exit_t + eps > MIN_T along the SAME ray, so the
#       origin-anchored forward trace/sweep would already have reported it as
#       its closest forward hit. The reference re-traces because its
#       single-hit queries measure t from the shifted origin; our sweeps see
#       every crossing from the origin, making the retry provably a miss.
#       The only divergence class is FP-grazing lanes where the
#       shifted-origin arithmetic rounds a borderline intersection
#       differently — measured to save a full dense outer-shell pass per
#       bounce (BASELINE.md).
#   "trace" — the reference-shaped retry trace, kept for A/B and as the
#       semantic oracle (tests/test_shell_sweep.py pins derive == trace).
ENTRY_RETRY_DEFAULT = _os.environ.get("NR_ENTRY_RETRY", "derive")


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


def _shell_entry_from_rays(outer, origins, dirs, ray_active, pdfs,
                           retry: str | None = None):
    """traceOuterShellEntryFromRaysKernel (:773-852): rays starting inside
    the outer shell first exit (BACKWARD_ONLY) then re-enter. Under the
    default retry="derive" the re-entry traces are skipped — they are
    provably misses (ENTRY_RETRY_DEFAULT note above)."""
    if retry is None:
        retry = ENTRY_RETRY_DEFAULT
    ok = ray_active & (pdfs > 0.0)
    res_fwd = traversal.trace_mesh(outer, origins, dirs,
                                   traversal.FORWARD_ONLY, active=ok)
    if retry != "trace":
        hit = ok & res_fwd.hit
        entry_pos = origins + dirs * res_fwd.t[None, :]
        entry_pos = where3(hit, entry_pos, jnp.zeros_like(entry_pos))
        accum_t = jnp.where(hit, res_fwd.t, 0.0)
        return entry_pos, hit, accum_t
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
                          entry=None,
                          camera_entry: str | None = None) -> HitState:
    """Full multi-segment march; returns a HitState over [N] rays.

    `params` is the RenderParams block (material/constant-color settings,
    outer-shell normalization bounds). `ray_active`/`pdfs` gate bounce rays
    like the reference's rayActiveMask/rayPdfs. `entry` optionally supplies a
    precomputed (entry_pos, active, accum_t) — the fused bounce stage
    (bounce_shell_entry_and_early_term) provides it from its shell sweep.
    """
    n = origins.shape[1]
    if camera_entry is None:
        camera_entry = CAMERA_ENTRY_DEFAULT

    sw_first = None  # iteration-1 sweep, precomputed on the camera fast path
    if entry is not None:
        entry_pos, active, accum_t = entry
    elif camera_rays and camera_entry == "trace":
        entry_pos, active, accum_t = _shell_entry_camera(ctx.outer, origins,
                                                         dirs)
    elif camera_rays:
        # Camera fast path: ONE sweep from the camera serves the shell entry
        # (outer_fwd — traceOuterShellEntryKernel :720-767) AND iteration
        # 1's segment sweep. Crossings of a closed surface alternate and the
        # inner shell lies inside the outer, so every crossing the first
        # iteration needs (first outer-bwd / inner-fwd / inner-bwd beyond
        # the entry, and the second outer-fwd as the re-entry) is already in
        # the camera sweep, just offset by entry_t + eps. Rays violating
        # those geometric assumptions (non-manifold shells, FP-grazing) are
        # re-swept exactly, compacted to a small buffer.
        sw0 = traversal.sweep_shells(ctx.outer, ctx.inner, origins, dirs,
                                     with_fwd2=True)
        entry_t = sw0.outer_fwd
        active = entry_t < 1e30
        entry_pos = where3(active, origins + dirs * entry_t[None, :],
                           jnp.zeros_like(origins))
        accum_t = jnp.where(active, entry_t, 0.0)
        base = entry_t + SEGMENT_EPSILON

        def derive(t0):
            tt = t0 - base
            return jnp.where((t0 < 1e30) & (tt > traversal.MIN_T), tt, 1e30)

        def dropped(t0):
            # A first crossing at/inside the entry hides any later crossing
            # of the same facing: must re-sweep.
            return (t0 < 1e30) & (t0 - base <= traversal.MIN_T)

        sw_first = traversal.ShellSweep(
            outer_fwd=derive(sw0.outer_fwd2),
            outer_bwd=derive(sw0.outer_bwd),
            inner_fwd=derive(sw0.inner_fwd),
            inner_bwd=derive(sw0.inner_bwd),
            outer_fwd2=jnp.full((n,), 1e30, jnp.float32))
        bad = active & (dropped(sw0.outer_bwd) | dropped(sw0.inner_fwd) |
                        dropped(sw0.inner_bwd) | dropped(sw0.outer_fwd2))
        n_bad = jnp.sum(bad.astype(jnp.int32))
        bad_cap = min(512, n)

        def fix_compact(sw1):
            (bidx,) = jnp.nonzero(bad, size=bad_cap, fill_value=n)
            bvalid = jnp.arange(bad_cap) < n_bad
            d_b = jnp.take(dirs, bidx, axis=1, mode="clip")
            o_b = jnp.take(entry_pos, bidx, axis=1,
                           mode="clip") + d_b * SEGMENT_EPSILON
            swb = traversal.sweep_shells(ctx.outer, ctx.inner, o_b, d_b)

            def scat(dst, src):
                return dst.at[bidx].set(
                    jnp.where(bvalid, src, jnp.take(dst, bidx, mode="clip")),
                    mode="drop")

            return traversal.ShellSweep(
                outer_fwd=scat(sw1.outer_fwd, swb.outer_fwd),
                outer_bwd=scat(sw1.outer_bwd, swb.outer_bwd),
                inner_fwd=scat(sw1.inner_fwd, swb.inner_fwd),
                inner_bwd=scat(sw1.inner_bwd, swb.inner_bwd),
                outer_fwd2=sw1.outer_fwd2)

        def fix_full(sw1):
            se = entry_pos + dirs * SEGMENT_EPSILON
            swf = traversal.sweep_shells(ctx.outer, ctx.inner, se, dirs)
            pick = lambda dst, src: jnp.where(bad, src, dst)
            return traversal.ShellSweep(
                outer_fwd=pick(sw1.outer_fwd, swf.outer_fwd),
                outer_bwd=pick(sw1.outer_bwd, swf.outer_bwd),
                inner_fwd=pick(sw1.inner_fwd, swf.inner_fwd),
                inner_bwd=pick(sw1.inner_bwd, swf.inner_bwd),
                outer_fwd2=sw1.outer_fwd2)

        sw_first = jax.lax.cond(
            n_bad == 0, lambda s: s,
            lambda s: jax.lax.cond(n_bad <= bad_cap, fix_compact, fix_full,
                                   s),
            sw_first)
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

    def segment_step(dirs_b, entry_b, active_b, accum_b, sw=None):
        """One march iteration over an arbitrary ray batch [*, K].

        Returns (found, hit_pos, normal, color, distance, new_active,
        new_entry, new_accum). Runs on the full batch OR on a compacted
        prefix (the TPU replacement for compactInputsKernel,
        cuda_renderer_neural.cu:1529-1541). `sw` optionally supplies this
        iteration's shell sweep (t's measured from shifted_entry) — the
        camera fast path derives it from the entry sweep.
        """
        k = dirs_b.shape[1]
        outer_min = params.outer_shell_min[:, None]
        inv_extent = params.outer_shell_inv_extent[:, None]

        # 1. Segment exits (traceSegmentExitsKernel :858-930): ONE fused
        # sweep over both shells replaces the separate outer-BACKWARD and
        # inner-ANY traces (inner ANY == min of its fwd/bwd closest hits).
        shifted_entry = entry_b + dirs_b * SEGMENT_EPSILON
        if sw is None:
            sw = traversal.sweep_shells(ctx.outer, ctx.inner, shifted_entry,
                                        dirs_b)
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

        # 3. Fused encode + MLP (tcnn inference, :2025-2032). active_b gates
        # the kernel's per-block skip: on the camera peel only ~1/3 of rays
        # are entry-active, and a compacted tier's tail blocks past `count`
        # are all-dead — dead 128-ray blocks skip encode+MLP entirely.
        outputs = nbvh.apply(ctx.net_params, net_in, ctx.config,
                             compute_dtype=compute_dtype,
                             use_kernel=True,
                             active=active_b)  # [16, K]; inference-only path

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
        # The reference re-traces outer FORWARD from shifted_exit; we reuse
        # the sweep's outer_fwd instead: crossings of a closed surface along
        # a line strictly alternate enter/exit, so after the entry (forward)
        # crossing the next forward crossing lies beyond the segment end —
        # sw.outer_fwd IS the re-entry. A masked re-trace under lax.cond
        # keeps exactness for degenerate (non-manifold / FP-borderline)
        # geometry where outer_fwd lands inside the segment.
        still = active_b & ~found
        shifted_exit = exit_pos + dirs_b * SEGMENT_EPSILON
        t_from_exit = sw.outer_fwd - (seg_t + SEGMENT_EPSILON)
        re_hit = (sw.outer_fwd < 1e30) & (t_from_exit > traversal.MIN_T)
        bad = still & (sw.outer_fwd < 1e30) & ~re_hit
        n_bad = jnp.sum(bad.astype(jnp.int32))
        bad_cap = min(512, k)

        def retrace_compact(args):
            # `bad` is a handful of FP-grazing rays per iteration, but an
            # unconditional masked dense retrace costs the full batch's
            # sweep; gather them into a tiny buffer first.
            re_hit, t_from_exit = args
            (bidx,) = jnp.nonzero(bad, size=bad_cap, fill_value=k)
            bvalid = jnp.arange(bad_cap) < n_bad
            res = traversal.trace_mesh(
                ctx.outer, jnp.take(shifted_exit, bidx, axis=1, mode="clip"),
                jnp.take(dirs_b, bidx, axis=1, mode="clip"),
                traversal.FORWARD_ONLY, active=bvalid)
            re2 = re_hit.at[bidx].set(
                jnp.where(bvalid, res.hit,
                          jnp.take(re_hit, bidx, mode="clip")), mode="drop")
            t2 = t_from_exit.at[bidx].set(
                jnp.where(bvalid, res.t,
                          jnp.take(t_from_exit, bidx, mode="clip")),
                mode="drop")
            return re2, t2

        def retrace_full(args):
            re_hit, t_from_exit = args
            res = traversal.trace_mesh(ctx.outer, shifted_exit, dirs_b,
                                       traversal.FORWARD_ONLY, active=bad)
            return (jnp.where(bad, res.hit, re_hit),
                    jnp.where(bad, res.t, t_from_exit))

        re_hit, t_from_exit = jax.lax.cond(
            n_bad == 0, lambda args: args,
            lambda args: jax.lax.cond(n_bad <= bad_cap, retrace_compact,
                                      retrace_full, args),
            (re_hit, t_from_exit))

        can_continue = still & (re_hit | inner_hit)
        reentry_t = jnp.where(re_hit, t_from_exit, 0.0)
        new_entry = shifted_exit + dirs_b * reentry_t[None, :]
        new_entry = where3(can_continue, new_entry, entry_b)
        new_accum = jnp.where(
            can_continue, accum_b + exit_t + reentry_t + 2.0 * SEGMENT_EPSILON,
            accum_b)
        return (found, hit_pos, normal, color, distance, can_continue,
                new_entry, new_accum)

    def merge_out(out, found, hit_pos, normal, color, distance):
        # material_params is the SAME global-material row for every march
        # hit (applySegmentNeuralOutputKernel semantics) — not carried
        # through the loop; reconstructed from the final hit mask after it
        # (3 fewer gather+scatter rows per compacted iteration).
        return HitState(
            position=where3(found, hit_pos, out.position),
            normal=where3(found, normal, out.normal),
            albedo=where3(found, color, out.albedo),
            material_params=out.material_params,
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

            # ONE packed gather for the 7 state rows (per-index overhead
            # dominates gather cost — scripts/bench_gather_pack.py).
            packed = jnp.concatenate(
                [dirs, entry_pos, accum_t[None, :]], axis=0)      # [7, n]
            pk = jnp.take(packed, idx, axis=1, mode="clip")
            dirs_k, entry_k, accum_k = pk[0:3], pk[3:6], pk[6]

            (found, hit_pos, normal, color, distance, new_active, new_entry,
             new_accum) = segment_step(dirs_k, entry_k, valid, accum_k)
            found &= valid
            new_active &= valid

            # Scatter-back: per-ROW [1,1]-window writes (~6x the [3,1]
            # column-window throughput, bench_gather_pack2.py), and
            # write-only-where-changed index masking — a lane that didn't
            # find/continue redirects its index out of range and DROPS,
            # which both halves the scatters and removes the five fallback
            # re-gathers of the prior values.
            fidx = jnp.where(found, idx, n)
            vidx = jnp.where(valid, idx, n)
            cidx = jnp.where(new_active, idx, n)

            def srow(dst, i, vals):
                return dst.at[i].set(vals, mode="drop")

            def srows3(dst, i, vals):
                return jnp.stack([srow(dst[0], i, vals[0]),
                                  srow(dst[1], i, vals[1]),
                                  srow(dst[2], i, vals[2])], axis=0)

            out = HitState(
                position=srows3(out.position, fidx, hit_pos),
                normal=srows3(out.normal, fidx, normal),
                albedo=srows3(out.albedo, fidx, color),
                material_params=out.material_params,
                hit=srow(out.hit, fidx, jnp.ones((k_cap,), bool)),
                distance=srow(out.distance, fidx, distance),
            )
            # active must flip True->False for resolved/exhausted lanes:
            # write new_active on every valid lane.
            active2 = srow(active, vidx, new_active)
            entry2 = srows3(entry_pos, cidx, new_entry)
            accum2 = srow(accum_t, cidx, new_accum)
            return active2, entry2, accum2, out

        operand = (active, entry_pos, accum_t, out)
        if use_compaction:
            import functools
            count = jnp.sum(active.astype(jnp.int32))
            # Capacity tiers: later march iterations usually carry <1% of
            # rays (small tier); the n/2 tier catches a camera_entry="trace"
            # iteration 1 (~25% of camera rays hit the outer shell) — the
            # march's network + sweep work is heavy enough per ray that
            # compaction pays even at half capacity (unlike the elementwise
            # bounce stages, BASELINE.md negative result).
            k_small = max(512, min(k_cap, n // 64))
            # The big (n/2) tier only exists for the "trace" camera entry —
            # its iteration 1 is the one march stage with ~n/4 actives;
            # elsewhere it would just lengthen compiles as a dead branch.
            k_big = min(n, max(k_cap, n // 2)) \
                if (camera_rays and entry is None
                    and camera_entry == "trace") else k_cap
            if k_big > k_cap:
                tail = lambda op: jax.lax.cond(
                    count <= k_big,
                    functools.partial(compact_branch, k_cap=k_big),
                    full_branch, op)
            else:
                tail = full_branch
            active, entry_pos, accum_t, out = jax.lax.cond(
                count <= k_small,
                functools.partial(compact_branch, k_cap=k_small),
                lambda op: jax.lax.cond(
                    count <= k_cap,
                    functools.partial(compact_branch, k_cap=k_cap),
                    tail, op),
                operand)
        else:
            active, entry_pos, accum_t, out = full_branch(operand)

        return (it + 1, active, entry_pos, accum_t, out)

    if sw_first is not None:
        # Peeled iteration 1 (full batch) consuming the precomputed sweep.
        # Compacting this peel to the entry-active prefix (~32% of camera
        # rays) was tried and REVERTED: at the n/2 tier the scatter-back of
        # ~14 HitState/state rows costs far more than the ~40 ns/ray of
        # network+segment math it saves (4.27 -> 2.35 Mrays/s @1080p,
        # BASELINE.md) — the same lesson as the whole-bounce-compaction
        # negative result: compaction pays only for sweep-heavy stages at
        # small tiers, and TPU scatters are several times the gather cost.
        (found, hit_pos, normal, color, distance, active, entry_pos,
         accum_t) = segment_step(dirs, entry_pos, active, accum_t,
                                 sw=sw_first)
        out_hit = merge_out(out_hit, found, hit_pos, normal, color, distance)
        state = (jnp.int32(1), active, entry_pos, accum_t, out_hit)
    else:
        state = (jnp.int32(0), active, entry_pos, accum_t, out_hit)
    _, _, _, _, out_hit = jax.lax.while_loop(cond, body, state)
    mat_params_row = vec3(
        jnp.broadcast_to(params.material_row[P_METALLIC], (n,)),
        jnp.broadcast_to(params.material_row[P_ROUGHNESS], (n,)),
        jnp.broadcast_to(params.material_row[P_SPECULAR], (n,)))
    return out_hit._replace(
        material_params=where3(out_hit.hit, mat_params_row,
                               out_hit.material_params))


def bounce_shell_entry_and_early_term(ctx: NeuralContext, rays, path_active,
                                      retry: str | None = None):
    """Fused bounce-stage shell work: checkBounceEarlyTerminationKernel
    (cuda_renderer_neural.cu:503-553) + traceOuterShellEntryFromRaysKernel
    (:773-852) share their ray origins, so ONE shell sweep serves both —
    replacing four facing-culled traces with a single dense pass. Under the
    default retry="derive" the inside-start re-entry trace is skipped too:
    the sweep's outer_fwd already IS the closest forward crossing from the
    origin, so a ray without one cannot gain one from a shifted origin
    (ENTRY_RETRY_DEFAULT note above) — that retry was a full dense
    outer-shell pass per bounce (BASELINE.md).

    Returns (active, (entry_pos, entry_hit, accum_t)); the tuple feeds
    trace_neural_segments(entry=...).
    """
    if retry is None:
        retry = ENTRY_RETRY_DEFAULT
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

    # Shell entry from arbitrary rays.
    ok = active & (rays.pdf > 0.0)
    fwd_hit = ok & (sw.outer_fwd < 1e30)
    if retry != "trace":
        entry_pos = rays.origin + rays.direction * sw.outer_fwd[None, :]
        entry_pos = where3(fwd_hit, entry_pos, jnp.zeros_like(entry_pos))
        accum_t = jnp.where(fwd_hit, sw.outer_fwd, 0.0)
        return active, (entry_pos, fwd_hit, accum_t)
    # Reference-shaped retry: rays starting inside the outer shell first
    # exit (BACKWARD) then re-enter via the masked retry trace.
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

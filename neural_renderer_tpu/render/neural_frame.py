"""Neural-branch frame: shell-march primary + hybrid additional mesh +
wavefront bounce loop.

Mirrors the NEURAL branch of RendererNeural::render()
(/root/reference/src/cuda_renderer_neural.cu:2258-2544, SURVEY.md §3.2):
  1. multi-segment shell march for camera rays
  2. additional-mesh primary trace + closest-hit merge (hybrid rendering)
  3. wavefront bounces: Disney sample -> early-termination check ->
     shell march from rays -> additional-mesh trace -> merge -> integrate
  4. finalize with running accumulation (or Lambert view)
All one jitted program per static config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import traversal
from ..ops.linalg import where3
from . import pathtrace as pt
from .neural_march import NeuralContext, bounce_shell_entry_and_early_term, \
    trace_neural_segments


def _bounce_stage(ctx, params, additional_mesh, use_additional, compute_dtype,
                  rays: "pt.BounceRays", active):
    """Everything between sampling and integration for one bounce: early
    termination + shell march + additional-mesh merge. Runs on any batch
    width, so the caller can feed a compacted prefix. Early termination and
    shell entry share one fused shell sweep (bounce_shell_entry_and_early_term)."""
    active, entry = bounce_shell_entry_and_early_term(ctx, rays, active)
    hits = trace_neural_segments(
        ctx, params, rays.origin, rays.direction, ray_active=active,
        pdfs=rays.pdf, camera_rays=False, compute_dtype=compute_dtype,
        entry=entry)
    if use_additional and not additional_mesh.is_empty:
        add_hits = pt.trace_rays_mesh(additional_mesh, params, rays.origin,
                                      rays.direction, traversal.ANY,
                                      active=rays.pdf > 0.0)
        hits = pt.select_closest_hits(params, hits, add_hits, rays.origin)
    return hits, active


def _bounce_stage_compacted(ctx, params, additional_mesh, use_additional,
                            compute_dtype, rays, path_active,
                            compaction=None):
    """Fixed-capacity compaction around the WHOLE bounce stage: the bounce
    marches and early-termination traces were the last full-batch work after
    the in-march compaction (BASELINE.md roadmap) — active bounce rays are
    typically <=30% after the primary hit mask and Russian roulette, so the
    stage runs on a gathered prefix whenever the count fits a tier.
    Bit-exact: the per-ray math is batch-position independent."""
    n = rays.origin.shape[1]
    mask = path_active & (rays.pdf > 0.0)
    stage = functools.partial(_bounce_stage, ctx, params, additional_mesh,
                              use_additional, compute_dtype)

    use = (n >= 4096) if compaction is None else bool(compaction)
    if not use:
        return stage(rays, mask)

    count = jnp.sum(mask.astype(jnp.int32))
    miss = pt.HitState(
        position=jnp.zeros((3, n), jnp.float32),
        normal=jnp.zeros((3, n), jnp.float32),
        albedo=jnp.zeros((3, n), jnp.float32),
        material_params=jnp.zeros((3, n), jnp.float32),
        hit=jnp.zeros((n,), bool),
        distance=jnp.zeros((n,), jnp.float32))

    def full(_):
        return stage(rays, mask)

    def prefix(k, _):
        # Spatially-sorted compaction order: bounce rays are scattered
        # (origins on surfaces, directions Disney-sampled), so pixel-order
        # 512-ray blocks build huge cluster footprints in the shell sweeps —
        # measured 537 ns/ray for the full-batch bounce sweep vs ~58
        # coherent. Ordering the gathered prefix by (direction octant |
        # origin morton | direction morton) makes every downstream sweep
        # (early-termination + all march iterations) run on tight frusta.
        # Sort the k-sized GATHERED prefix, not the full batch: a TPU
        # argsort is O(n log^2 n) bitonic passes and a full-batch sort was
        # ~an order of magnitude more work than the nonzero cumsum + k-key
        # sort (measured ~200 ms/bounce at 2.07M rays even with zero active
        # rays). Invalid slots gather idx0 = n -> origin/dir from clipped
        # lane n-1 with valid=False; their keys sort to the back
        # (int32 max), so actives still occupy exactly the first `count`
        # slots and per-ray math is order-independent -> results unchanged.
        (idx0,) = jnp.nonzero(mask, size=k, fill_value=n)
        valid0 = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0] < count
        # ONE packed gather for all 8 prefix rows (measured 5.5x the cost of
        # per-array gathers at this k: per-index overhead dominates, so more
        # rows per window are nearly free — scripts/bench_gather_pack.py).
        packed = jnp.concatenate(
            [rays.origin, rays.direction, rays.pdf[None, :],
             rays.distance[None, :]], axis=0)                   # [8, n]
        pk = jnp.take(packed, idx0, axis=1, mode="clip")        # [8, k]
        order_k = traversal._ray_sort_order(pk[0:3], pk[3:6], valid0)
        idx = jnp.take(idx0, order_k)
        pk = jnp.take(pk, order_k, axis=1)
        slot = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]
        valid = slot < count
        rays_k = pt.BounceRays(
            origin=pk[0:3],
            direction=pk[3:6],
            pdf=jnp.where(valid, pk[6], 0.0),
            # brdf_weight is consumed only by the FULL-BATCH integrator after
            # the stage (integrate_bounce); the stage itself never reads it —
            # skip gathering those 3 rows.
            brdf_weight=jnp.zeros((3, k), jnp.float32),
            distance=pk[7])
        hits_k, act_k = stage(rays_k, valid)

        # Scatter-back as per-ROW [1,1]-window scatters: measured ~6x the
        # throughput of [3,1]-window column scatters (bench_gather_pack2.py).
        # Invalid slots carry idx == n (nonzero fill survives the sort: their
        # keys are int32 max) and drop.
        def srow(vals):
            return jnp.zeros((n,), vals.dtype).at[idx].set(vals, mode="drop")

        def srows3(a):
            return jnp.stack([srow(a[0]), srow(a[1]), srow(a[2])], axis=0)

        hit_full = srow(hits_k.hit & valid)
        if not use_additional or additional_mesh.is_empty:
            # Without a hybrid additional mesh every march hit carries the
            # SAME global-material (metallic, roughness, specular) row
            # (applySegmentNeuralOutputKernel semantics) — rebuild it from
            # the scattered hit mask instead of scattering 3 more rows
            # (TPU scatters cost several times the equivalent gathers).
            from ..ops.linalg import vec3
            from ..scene.materials import (P_METALLIC, P_ROUGHNESS,
                                           P_SPECULAR)
            mp = vec3(
                jnp.broadcast_to(params.material_row[P_METALLIC], (n,)),
                jnp.broadcast_to(params.material_row[P_ROUGHNESS], (n,)),
                jnp.broadcast_to(params.material_row[P_SPECULAR], (n,)))
            material_params = where3(hit_full, mp, 0.0)
        else:
            material_params = srows3(hits_k.material_params)
        hits = pt.HitState(
            position=srows3(hits_k.position),
            normal=srows3(hits_k.normal),
            albedo=srows3(hits_k.albedo),
            material_params=material_params,
            hit=hit_full,
            distance=srow(jnp.where(valid, hits_k.distance, 0.0)))
        active = srow(act_k & valid)
        return hits, active

    def dead(_):
        # Zero active bounce rays (common on later bounces once paths have
        # left the shell): the stage's output for an all-invalid prefix is
        # exactly (miss, no-actives) — skip the sweeps AND the sort/gather.
        return miss, jnp.zeros((n,), bool)

    # Tier ladder: smallest capacity that fits `count` wins. n/4 exists
    # because measured bounce-1 active fractions sit at ~13-20% (just above
    # the n/8 cut) — without it they ran the whole stage at n/2 width.
    tiers = sorted({max(512, n // 8), max(512, n // 4), max(512, n // 2)})

    def cascade(i, op):
        if i == len(tiers):
            return full(op)
        return jax.lax.cond(count <= tiers[i],
                            functools.partial(prefix, tiers[i]),
                            functools.partial(cascade, i + 1), op)

    return jax.lax.cond(count == 0, dead, functools.partial(cascade, 0), 0)


def render_neural_frame(ctx: NeuralContext, additional_mesh, env, params, accum,
                        use_additional: bool = False,
                        compute_dtype=jnp.bfloat16,
                        return_guides: bool = False,
                        bounce_compaction: bool | None = None,
                        row0=0, n_rows=None):
    """One accumulation batch of neural path tracing.
    Returns (image_u8, new_accum)[, (guide_normals, guide_albedo)].
    row0/n_rows render a horizontal stripe with GLOBAL pixel ids (tile data
    parallelism, parallel/shardings.py); accum covers just that stripe."""
    pixel_idx, sample_of, _, origins, dirs = pt.primary_rays(params, row0,
                                                             n_rows)

    hits = trace_neural_segments(ctx, params, origins, dirs, camera_rays=True,
                                 compute_dtype=compute_dtype)

    if use_additional and not additional_mesh.is_empty:
        add_hits = pt.trace_rays_mesh(additional_mesh, params, origins, dirs,
                                      traversal.FORWARD_ONLY)
        hits = pt.select_closest_hits(params, hits, add_hits, origins)

    path = pt.init_path_state(params, env, hits, dirs)

    incoming = None
    cur_hits = hits
    for bounce in range(1, params.max_bounces + 1):
        def bounce_body(carry, bounce=bounce):
            path, incoming, cur_hits = carry
            rays = pt.sample_bounce_directions(params, pixel_idx, sample_of,
                                               cur_hits, path.active, incoming)
            path = pt.update_active_after_sampling(path, cur_hits, rays)

            # Early termination + shell march + hybrid merge run on a
            # compacted active-ray prefix when the count fits a tier
            # (bit-exact vs full).
            bounce_hits, active = _bounce_stage_compacted(
                ctx, params, additional_mesh, use_additional, compute_dtype,
                rays, path.active, compaction=bounce_compaction)
            path = path._replace(active=active)

            path = pt.integrate_bounce(params, env, path, bounce_hits, rays,
                                       bounce, pixel_idx, sample_of)
            return path, rays.direction, bounce_hits

        if incoming is None:
            # First bounce: incoming is regenerated from the RNG stream
            # (sample_bounce_directions None contract) — run unconditionally.
            path, incoming, cur_hits = bounce_body((path, incoming, cur_hits))
        else:
            # Later bounces: when NO path is active the whole body is an
            # exact identity on PathState — update_active can only clear
            # flags and integrate_bounce writes radiance/throughput only
            # under `active` masks (pathtrace.py:217-262). Skipping it also
            # skips the full-batch sampling + integration VPU work, which
            # is most of what a dead bounce still cost after the stage-level
            # dead branch. `incoming`/`cur_hits` differ across branches but
            # are unobservable: once all paths are inactive they stay
            # inactive (active' is always a subset), so no later bounce
            # reads them into the radiance. RNG streams are re-derived per
            # bounce from (pixel, sample, bounce), never threaded through.
            path, incoming, cur_hits = jax.lax.cond(
                jnp.any(path.active), bounce_body, lambda c: c,
                (path, incoming, cur_hits))

    img, new_accum = pt.finalize(params, path.radiance, accum)
    if return_guides:
        return img, new_accum, pt.guide_buffers(params, hits, n_rows)
    return img, new_accum


def render_neural_lambert(ctx: NeuralContext, additional_mesh, env, params,
                          use_additional: bool = False,
                          compute_dtype=jnp.bfloat16):
    """Neural branch with Lambert view (no bounces)."""
    _, _, _, origins, dirs = pt.primary_rays(params)
    hits = trace_neural_segments(ctx, params, origins, dirs, camera_rays=True,
                                 compute_dtype=compute_dtype)
    if use_additional and not additional_mesh.is_empty:
        add_hits = pt.trace_rays_mesh(additional_mesh, params, origins, dirs,
                                      traversal.FORWARD_ONLY)
        hits = pt.select_closest_hits(params, hits, add_hits, origins)
    return pt.lambert_shade(params, env, hits, dirs)

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

import jax.numpy as jnp

from ..ops import traversal
from . import pathtrace as pt
from .neural_march import NeuralContext, check_bounce_early_termination, \
    trace_neural_segments


def render_neural_frame(ctx: NeuralContext, additional_mesh, env, params, accum,
                        use_additional: bool = False,
                        compute_dtype=jnp.bfloat16,
                        return_guides: bool = False):
    """One accumulation batch of neural path tracing.
    Returns (image_u8, new_accum)[, (guide_normals, guide_albedo)]."""
    pixel_idx, sample_of, _, origins, dirs = pt.primary_rays(params)

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
        rays = pt.sample_bounce_directions(params, pixel_idx, sample_of,
                                           cur_hits, path.active, incoming)
        path = pt.update_active_after_sampling(path, cur_hits, rays)

        active = check_bounce_early_termination(ctx.outer, ctx.inner, params,
                                                rays, path.active)
        path = path._replace(active=active)

        bounce_hits = trace_neural_segments(
            ctx, params, rays.origin, rays.direction, ray_active=path.active,
            pdfs=rays.pdf, camera_rays=False, compute_dtype=compute_dtype)

        if use_additional and not additional_mesh.is_empty:
            add_hits = pt.trace_rays_mesh(
                additional_mesh, params, rays.origin, rays.direction,
                traversal.ANY, active=rays.pdf > 0.0)
            bounce_hits = pt.select_closest_hits(params, bounce_hits, add_hits,
                                                 rays.origin)

        path = pt.integrate_bounce(params, env, path, bounce_hits, rays,
                                   bounce, pixel_idx, sample_of)
        incoming = rays.direction
        cur_hits = bounce_hits

    img, new_accum = pt.finalize(params, path.radiance, accum)
    if return_guides:
        return img, new_accum, pt.guide_buffers(params, hits)
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

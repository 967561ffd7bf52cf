"""Wavefront path tracing stages + the ground-truth render pipeline.

Each reference CUDA kernel (SURVEY.md §2.2) becomes a function over flat
[N = spp * pixels] sample arrays; the whole frame is ONE jitted program — no
kernel-launch boundaries, no host syncs, XLA fuses the elementwise stages into
the traces. The sample layout matches the reference:
sample_idx = pixel_idx + s * pixel_count (so RNG streams are identical).

All vector state is channel-major [3, N] (ops/linalg.py layout note); the
accumulation buffer is [3, P] and the u8 image is assembled [H, W, 3] only at
the output boundary.

Kernels covered here:
  intersectGroundTruthKernel       -> trace_primary_gt
  initializePathStateKernel        -> init_path_state
  sampleBounceDirectionsKernel     -> sample_bounce_directions
  traceGroundTruthBouncesKernel    -> trace_bounces_gt
  integrateBounceKernel            -> integrate_bounce
  finalizePathTracingKernel        -> finalize
  lambertKernel                    -> lambert_shade
(cuda_renderer_neural.cu:244-709, 1547-1607)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import traversal
from ..ops.brdf import BrdfMaterial, build_tangent_space, disney_eval, \
    disney_sample_3component
from ..ops.camera import generate_primary_rays
from ..ops.envlight import sample_environment, sample_environment_clamped
from ..ops.intersect import compute_hit_data, resolve_material
from ..ops.linalg import dot, safe_normalize, splat, vec3, where3
from ..ops.rng import init_rng, rand01
from ..ops.srgb import encode_srgb_u8
from ..scene.materials import P_METALLIC, P_ROUGHNESS, P_SPECULAR


class HitState(NamedTuple):
    """Per-sample hit buffers (positions/normals/colors/params/flags/dist)."""
    position: jnp.ndarray        # [3, N]
    normal: jnp.ndarray          # [3, N]
    albedo: jnp.ndarray          # [3, N]
    material_params: jnp.ndarray  # [3, N] rows: metallic, roughness, specular
    hit: jnp.ndarray             # [N] bool
    distance: jnp.ndarray        # [N] — hit t (neural: predicted distance)


class PathState(NamedTuple):
    throughput: jnp.ndarray  # [3, N]
    radiance: jnp.ndarray    # [3, N]
    active: jnp.ndarray      # [N] bool


class BounceRays(NamedTuple):
    origin: jnp.ndarray      # [3, N]
    direction: jnp.ndarray   # [3, N]
    pdf: jnp.ndarray         # [N]
    brdf_weight: jnp.ndarray  # [3, N] — f * cos / pdf
    distance: jnp.ndarray    # [N] — passthrough neural distance


def sample_grid(params, row0=0, n_rows: int | None = None):
    """Flat [N] pixel coords + ids, N = spp * pixels, s-major like the CUDA
    sample indexing (sample_idx = pixel + s * pixel_count).

    row0/n_rows select a horizontal stripe for tile data-parallel rendering
    (pixel ids stay GLOBAL so RNG streams are identical to the full-frame
    render regardless of the tiling); row0 may be a traced value
    (lax.axis_index inside shard_map)."""
    if n_rows is None:
        n_rows = params.height
    p = n_rows * params.width
    spp = params.samples_per_pixel
    local = jnp.arange(p, dtype=jnp.int32)
    px = local % params.width
    py = jnp.asarray(row0, jnp.int32) + local // params.width
    pix = py * params.width + px
    px = jnp.tile(px, spp)
    py = jnp.tile(py, spp)
    pixel_idx = jnp.tile(pix, spp)
    sample_of = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), p)
    return px, py, pixel_idx, sample_of


def primary_rays(params, row0=0, n_rows: int | None = None):
    px, py, pixel_idx, s = sample_grid(params, row0, n_rows)
    state = init_rng(pixel_idx.astype(jnp.uint32), params.sample_offset,
                     s.astype(jnp.uint32))
    state, origins, dirs = generate_primary_rays(
        px, py, state, params.cam_pos, params.cam_forward, params.cam_right,
        params.cam_up, params.fov_y, params.width, params.height)
    return pixel_idx, s, state, origins, dirs


def _resolve_hits(mesh, params, origins, dirs, res) -> HitState:
    """Shared hit resolution: computeHitData + resolveMaterial, with the
    global-material fallback writes of the CUDA kernels on miss."""
    hd = compute_hit_data(mesh, origins, dirs, res.tri, res.u, res.v, res.t)
    rm = resolve_material(mesh, hd.material_id, hd.uv, params.material_row)
    hit = res.hit
    n = hit.shape[0]
    zero3 = jnp.zeros((3, n), jnp.float32)
    global_params = vec3(
        jnp.broadcast_to(params.material_row[P_METALLIC], (n,)),
        jnp.broadcast_to(params.material_row[P_ROUGHNESS], (n,)),
        jnp.broadcast_to(params.material_row[P_SPECULAR], (n,)))
    hit_params = vec3(rm.metallic, rm.roughness, rm.specular)
    return HitState(
        position=where3(hit, hd.position, zero3),
        normal=where3(hit, hd.shading_normal, zero3),
        albedo=where3(hit, rm.base_color, zero3),
        material_params=where3(hit, hit_params, global_params),
        hit=hit,
        distance=jnp.where(hit, res.t, 0.0),
    )


def trace_primary_gt(mesh, params, origins, dirs) -> HitState:
    """intersectGroundTruthKernel (cuda_renderer_neural.cu:244-296):
    primary rays vs the classic mesh, FORWARD_ONLY (backface cull)."""
    res = traversal.trace_mesh(mesh, origins, dirs, traversal.FORWARD_ONLY)
    return _resolve_hits(mesh, params, origins, dirs, res)


def trace_rays_mesh(mesh, params, origins, dirs, mode, active=None) -> HitState:
    """Generic mesh trace + material resolution (bounce / additional mesh)."""
    res = traversal.trace_mesh(mesh, origins, dirs, mode, active=active)
    return _resolve_hits(mesh, params, origins, dirs, res)


def init_path_state(params, env, hits: HitState, prim_dirs) -> PathState:
    """initializePathStateKernel (cuda_renderer_neural.cu:303-354)."""
    n = hits.hit.shape[0]
    env_light = where3(
        jnp.broadcast_to(params.use_direct_env_color, (n,)),
        splat(params.direct_env_color, n),
        sample_environment_clamped(env, prim_dirs, params.max_radiance))
    radiance = where3(hits.hit, jnp.zeros((3, n), jnp.float32), env_light)
    throughput = jnp.ones((3, n), jnp.float32)
    return PathState(throughput=throughput, radiance=radiance, active=hits.hit)


def _surface_material(params, albedo, material_params) -> BrdfMaterial:
    """Global material with per-hit base_color/metal/rough/spec overrides
    (cuda_renderer_neural.cu:441-446)."""
    n = albedo.shape[1]
    mat = BrdfMaterial.broadcast_from_row(params.material_row, n)
    return mat._replace(
        base_color=albedo,
        metallic=material_params[0],
        roughness=material_params[1],
        specular=material_params[2],
    )


def sample_bounce_directions(params, pixel_idx, sample_of, hits: HitState,
                             path_active, incoming_dirs) -> BounceRays:
    """sampleBounceDirectionsKernel (cuda_renderer_neural.cu:357-499).

    incoming_dirs: None on the first bounce — the primary ray is regenerated
    from the same RNG stream (consuming 2 draws before u1..u3, as in CUDA);
    afterwards the stored previous bounce direction is used and u1..u3 are the
    stream's first 3 draws. This reproduces the reference's RNG reuse across
    bounces >= 2 exactly.
    """
    state = init_rng(pixel_idx.astype(jnp.uint32), params.sample_offset,
                     sample_of.astype(jnp.uint32))

    if incoming_dirs is None:
        px = pixel_idx % params.width
        py = pixel_idx // params.width
        state, _, incoming = generate_primary_rays(
            px, py, state, params.cam_pos, params.cam_forward,
            params.cam_right, params.cam_up, params.fov_y,
            params.width, params.height)
    else:
        incoming = incoming_dirs

    normal = safe_normalize(hits.normal, min_len=0.0)
    # Flip normal toward the viewer (NBVH shading_frame).
    normal = where3(dot(normal, incoming) > 0.0, -normal, normal)

    wo = -incoming
    tangent, bitangent = build_tangent_space(normal)
    mat = _surface_material(params, hits.albedo, hits.material_params)

    state, u1 = rand01(state)
    state, u2 = rand01(state)
    state, u3 = rand01(state)
    wi, pdf = disney_sample_3component(mat, normal, wo, tangent, bitangent,
                                       u1, u2, u3)
    f = disney_eval(mat, normal, wo, wi, tangent, bitangent)
    cos_theta = jnp.abs(dot(normal, wi))
    brdf_weight = f * (cos_theta / jnp.where(pdf > 0.0, pdf, 1.0))[None, :]

    finite = jnp.all(jnp.isfinite(brdf_weight), axis=0)
    valid = hits.hit & path_active & (pdf > 0.0) & finite

    ray_offset = params.scene_scale * 1e-6
    origin = hits.position + normal * ray_offset

    zero3 = jnp.zeros_like(origin)
    return BounceRays(
        origin=where3(valid, origin, zero3),
        direction=where3(valid, wi, zero3),
        pdf=jnp.where(valid, pdf, 0.0),
        brdf_weight=where3(valid, brdf_weight, zero3),
        distance=hits.distance,
    )


def update_active_after_sampling(path: PathState, hits: HitState,
                                 rays: BounceRays) -> PathState:
    """The CUDA sampler clears pathActive for pdf<=0 / NaN samples
    (cuda_renderer_neural.cu:457-477)."""
    still = path.active & hits.hit & (rays.pdf > 0.0)
    return path._replace(active=still)


def trace_bounces_gt(mesh, params, rays: BounceRays) -> HitState:
    """traceGroundTruthBouncesKernel (cuda_renderer_neural.cu:556-618):
    bounce rays vs GT mesh with TraceMode::ANY."""
    active = rays.pdf > 0.0
    return trace_rays_mesh(mesh, params, rays.origin, rays.direction,
                           traversal.ANY, active=active)


def integrate_bounce(params, env, path: PathState, bounce_hits: HitState,
                     rays: BounceRays, bounce_index: int, pixel_idx,
                     sample_of) -> PathState:
    """integrateBounceKernel (cuda_renderer_neural.cu:621-675)."""
    active = path.active
    new_tp = path.throughput * rays.brdf_weight

    # Miss -> environment + terminate.
    env_light = sample_environment_clamped(env, rays.direction, params.max_radiance)
    missed = active & ~bounce_hits.hit
    radiance = where3(missed, path.radiance + new_tp * env_light, path.radiance)

    # Max bounce cut.
    hit_cont = active & bounce_hits.hit
    if bounce_index >= params.max_bounces:
        still = jnp.zeros_like(active)
        tp = where3(active, new_tp, path.throughput)
        return PathState(throughput=tp, radiance=radiance, active=still)

    # Russian roulette, every bounce, p = max throughput component clamped to 1.
    survival = jnp.minimum(1.0, jnp.max(new_tp, axis=0))
    rr_state = init_rng(pixel_idx.astype(jnp.uint32),
                        params.sample_offset + jnp.uint32(bounce_index),
                        sample_of.astype(jnp.uint32))
    _, rr = rand01(rr_state)
    survive = rr < survival
    still = hit_cont & survive
    tp_rr = new_tp / jnp.maximum(survival, 1e-20)[None, :]
    tp = where3(still, tp_rr, where3(active, new_tp, path.throughput))
    return PathState(throughput=tp, radiance=radiance, active=still)


def finalize(params, path_radiance, accum):
    """finalizePathTracingKernel (cuda_renderer_neural.cu:678-709):
    per-pixel sum over spp -> accum add -> normalize -> sRGB u8.
    path_radiance: [3, N]; accum: [3, rows*W]. Returns
    (image_u8 [rows, W, 3], new_accum [3, rows*W]); rows inferred so the same
    code serves full frames and shard stripes."""
    p = path_radiance.shape[1] // params.samples_per_pixel
    per_pixel = path_radiance.reshape(3, params.samples_per_pixel, p).sum(axis=1)
    new_accum = accum + per_pixel
    inv = 1.0 / (params.sample_offset.astype(jnp.float32)
                 + jnp.float32(params.samples_per_pixel))
    color = new_accum * inv
    img = encode_srgb_u8(color).reshape(3, p // params.width, params.width)
    return img.transpose(1, 2, 0), new_accum


def accum_image(params, accum, total_spp):
    """Image straight from an accumulation buffer: normalize by the TOTAL
    sample count and sRGB-encode. The in-jit multi-batch renderer
    (Renderer.render_accumulate) carries only `accum` through its fori_loop
    and derives the image once at the end with this, instead of paying the
    finalize() u8 encode every batch."""
    color = accum * (1.0 / jnp.float32(total_spp))
    img = encode_srgb_u8(color).reshape(3, -1, params.width)
    return img.transpose(1, 2, 0)


def lambert_shade(params, env, hits: HitState, prim_dirs):
    """lambertKernel (cuda_renderer_neural.cu:1547-1607): N·V shading,
    raw environment on miss, average over spp. Returns image u8 [rows, W, 3]."""
    normal = safe_normalize(hits.normal, min_len=0.0)
    flip = dot(normal, prim_dirs) > 0.0
    normal = where3(flip, -normal, normal)
    ndotl = jnp.maximum(0.0, dot(normal, -prim_dirs))
    lit = hits.albedo * ndotl[None, :]
    env_color = sample_environment(env, prim_dirs)
    color = where3(hits.hit, lit, env_color)
    p = color.shape[1] // params.samples_per_pixel
    avg = color.reshape(3, params.samples_per_pixel, p).mean(axis=1)
    img = encode_srgb_u8(avg).reshape(3, p // params.width, params.width)
    return img.transpose(1, 2, 0)


def select_closest_hits(params, a: HitState, b: HitState, ray_origins) -> HitState:
    """selectClosest[Primary]HitKernel (cuda_renderer_neural.cu:1307-1450):
    merge two hit sets by distance from the ray origin."""
    da = a.position - ray_origins
    db = b.position - ray_origins
    dist_a = jnp.sqrt(jnp.maximum(dot(da, da), 0.0))
    dist_b = jnp.sqrt(jnp.maximum(dot(db, db), 0.0))
    use_b = (b.hit & ~a.hit) | (a.hit & b.hit & (dist_b < dist_a))
    return HitState(
        position=where3(use_b, b.position, a.position),
        normal=where3(use_b, b.normal, a.normal),
        albedo=where3(use_b, b.albedo, a.albedo),
        material_params=where3(use_b, b.material_params, a.material_params),
        hit=a.hit | b.hit,
        distance=jnp.where(use_b, dist_b, a.distance),
    )


def guide_buffers(params, hits: HitState, n_rows=None):
    """Sample-0 primary-hit normals/albedo as [3, rows, W] — the denoiser
    guides (denoiser.cuh:43-45)."""
    rows = n_rows if n_rows is not None else params.height
    p = rows * params.width
    normals = hits.normal[:, :p].reshape(3, rows, params.width)
    albedo = hits.albedo[:, :p].reshape(3, rows, params.width)
    return normals, albedo


# ---------------------------------------------------------------------------
# Full GT frame (render() GT branch, cuda_renderer_neural.cu:2546-2733)
# ---------------------------------------------------------------------------

def render_gt_frame(mesh, env, params, accum, row0=0, n_rows=None,
                    return_guides: bool = False):
    """One accumulation batch of ground-truth path tracing.

    Returns (image_u8, new_accum)[, (guide_normals, guide_albedo)]. Must be
    called with sample_offset advanced by samples_per_pixel between calls
    (evaluate.cu:253-264 semantics). row0/n_rows render a horizontal stripe
    (tile data parallelism); accum [3, rows*W] covers just that stripe.
    """
    pixel_idx, sample_of, _, origins, dirs = primary_rays(params, row0, n_rows)
    hits = trace_primary_gt(mesh, params, origins, dirs)
    path = init_path_state(params, env, hits, dirs)

    incoming = None
    cur_hits = hits
    for bounce in range(1, params.max_bounces + 1):
        def bounce_body(carry, bounce=bounce):
            path, incoming, cur_hits = carry
            rays = sample_bounce_directions(params, pixel_idx, sample_of,
                                            cur_hits, path.active, incoming)
            path = update_active_after_sampling(path, cur_hits, rays)
            bounce_hits = trace_bounces_gt(mesh, params, rays)
            path = integrate_bounce(params, env, path, bounce_hits, rays,
                                    bounce, pixel_idx, sample_of)
            return path, rays.direction, bounce_hits

        if incoming is None:
            path, incoming, cur_hits = bounce_body((path, incoming, cur_hits))
        else:
            # Dead-bounce skip: exact identity on PathState when no path is
            # active — same argument as the neural frame's bounce loop
            # (render/neural_frame.py); trace_bounces_gt masks on pdf>0 and
            # integrate writes only under active masks.
            path, incoming, cur_hits = jax.lax.cond(
                jnp.any(path.active), bounce_body, lambda c: c,
                (path, incoming, cur_hits))

    img, new_accum = finalize(params, path.radiance, accum)
    if return_guides:
        return img, new_accum, guide_buffers(params, hits, n_rows)
    return img, new_accum


def render_gt_lambert(mesh, env, params):
    _, _, _, origins, dirs = primary_rays(params)
    hits = trace_primary_gt(mesh, params, origins, dirs)
    return lambert_shade(params, env, hits, dirs)

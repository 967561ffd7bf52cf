"""Ray-triangle intersection, hit-data computation, material resolution.

Vectorized re-implementations of /root/reference/src/mesh_intersection.cuh:
Möller-Trumbore (:15-46), orthonormal basis (:91-103), manual texture
sampling (:109-152), computeHitData (:168-238) and resolveMaterial
(:299-337). Per-triangle material lookup uses a precomputed [T] id array
instead of the reference's per-hit binary search over primitive ranges
(:53-70) — a single gather on TPU.

All vectors are channel-major [3, N] (see ops/linalg.py layout note); table
gathers are per-component [N] pulls so nothing materializes a lane-padded
[N, small] buffer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.materials import (
    NUM_SCALARS, P_ANISOTROPY, P_BASE_B, P_BASE_G, P_BASE_R, P_CLEARCOAT,
    P_CLEARCOAT_GLOSS, P_EMISSION_B, P_EMISSION_G, P_EMISSION_R,
    P_EMISSION_SCALE, P_IOR, P_METALLIC, P_ROUGHNESS, P_SHEEN, P_SHEEN_TINT,
    P_SPECULAR, P_SPECULAR_TINT, P_SPEC_TRANS, T_BASE_COLOR, T_METALLIC,
    T_NORMAL, T_ROUGHNESS, T_SPECULAR,
)
from .linalg import cross, dot, safe_normalize, vec3, where3

TRI_EPSILON = 1e-8


def intersect_triangle(origins, dirs, v0, v1, v2):
    """Möller-Trumbore over [N] rays x their own triangle ([3, N] operands).

    Returns (t, u, v, valid); t = 1e30 when invalid
    (mesh_intersection.cuh:15-46).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(dirs, e2)
    det = dot(e1, pvec)
    ok = jnp.abs(det) >= TRI_EPSILON
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = origins - v0
    u = dot(tvec, pvec) * inv_det
    ok &= (u >= 0.0) & (u <= 1.0)
    qvec = cross(tvec, e1)
    v = dot(dirs, qvec) * inv_det
    ok &= (v >= 0.0) & (u + v <= 1.0)
    t = dot(e2, qvec) * inv_det
    ok &= t > TRI_EPSILON
    t = jnp.where(ok, t, 1e30)
    return t, u, v, ok


def intersect_aabb(origins, inv_dirs, bounds_min, bounds_max, t_max):
    """Slab test with the reference's 1e-10 bound expansion
    (mesh_traversal.cuh:61-93). [3, N] operands; returns (hit, t_near)."""
    eps = 1e-10
    t1 = (bounds_min - eps - origins) * inv_dirs
    t2 = (bounds_max + eps - origins) * inv_dirs
    tmin = jnp.max(jnp.minimum(t1, t2), axis=0)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=0)
    hit = ~((tmax < 0.0) | (tmin > t_max) | (tmin > tmax))
    return hit, tmin


def ortho_basis(normal):
    """TBN basis from a [3, N] normal (mesh_intersection.cuh:91-103)."""
    ax = jnp.abs(normal[0]) < 0.6
    ay = jnp.abs(normal[1]) < 0.6
    bx = ax
    by = (~ax) & ay
    bz = (~ax) & (~ay)
    b = jnp.stack([bx, by, bz], axis=0).astype(normal.dtype)
    tangent = safe_normalize(cross(b, normal), eps=1e-20)
    bitangent = safe_normalize(cross(normal, tangent), eps=1e-20)
    return tangent, bitangent


# ---------------------------------------------------------------------------
# Texture sampling from the packed atlas ([3, P] channel-major)
# ---------------------------------------------------------------------------

def sample_texture(mesh, tex_id, u, v):
    """Sample the packed atlas; returns (rgb [3, N], valid [N]).

    Matches sampleTextureRawDev (mesh_intersection.cuh:109-152): wrap uv by
    fract, then nearest or bilinear over [0, dim-1] with clamping.
    """
    valid = tex_id >= 0
    tid = jnp.clip(tex_id, 0, mesh.tex_width.shape[0] - 1)
    w = jnp.take(mesh.tex_width, tid)
    h = jnp.take(mesh.tex_height, tid)
    off = jnp.take(mesh.tex_offset, tid)

    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)

    def fetch(xi, yi):
        idx = jnp.clip(off + yi * w + xi, 0, mesh.atlas.shape[1] - 1)
        return jnp.take(mesh.atlas, idx, axis=1)  # [3, N]

    if mesh.texture_nearest:
        x = jnp.clip((uu * w.astype(jnp.float32)).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((vv * h.astype(jnp.float32)).astype(jnp.int32), 0, h - 1)
        return fetch(x, y), valid

    x = uu * (w - 1).astype(jnp.float32)
    y = vv * (h - 1).astype(jnp.float32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    tx = (x - x0.astype(jnp.float32))[None, :]
    ty = (y - y0.astype(jnp.float32))[None, :]
    c00 = fetch(x0, y0)
    c10 = fetch(x1, y0)
    c01 = fetch(x0, y1)
    c11 = fetch(x1, y1)
    c0 = c00 * (1.0 - tx) + c10 * tx
    c1 = c01 * (1.0 - tx) + c11 * tx
    return c0 * (1.0 - ty) + c1 * ty, valid


# ---------------------------------------------------------------------------
# Hit data
# ---------------------------------------------------------------------------

class HitData(NamedTuple):
    position: jnp.ndarray          # [3, N]
    t: jnp.ndarray                 # [N]
    shading_normal: jnp.ndarray    # [3, N]
    geometric_normal: jnp.ndarray  # [3, N]
    uv: jnp.ndarray                # [2, N]
    material_id: jnp.ndarray       # [N] i32 (-1 = global)


def _fetch_triangle(mesh, tri):
    """tri: [N] indices -> (v0, v1, v2, idx) with [3, N] corners."""
    idx = jnp.take(mesh.indices, tri, axis=1)            # [3, N] vertex ids
    v0 = jnp.take(mesh.vertices, idx[0], axis=1)
    v1 = jnp.take(mesh.vertices, idx[1], axis=1)
    v2 = jnp.take(mesh.vertices, idx[2], axis=1)
    return v0, v1, v2, idx


def compute_hit_data(mesh, origins, dirs, tri_idx, u, v, t) -> HitData:
    """Barycentric position/normal/uv + material id + normal map
    (mesh_intersection.cuh:168-238). Caller masks out misses."""
    tri = jnp.clip(tri_idx, 0, mesh.indices.shape[1] - 1)
    v0, v1, v2, idx = _fetch_triangle(mesh, tri)
    w = (1.0 - u - v)[None, :]
    uu = u[None, :]
    vv = v[None, :]

    geom_n = safe_normalize(cross(v1 - v0, v2 - v0), eps=1e-20)
    if mesh.has_normals:
        n0 = jnp.take(mesh.normals, idx[0], axis=1)
        n1 = jnp.take(mesh.normals, idx[1], axis=1)
        n2 = jnp.take(mesh.normals, idx[2], axis=1)
        shading_n = safe_normalize(n0 * w + n1 * uu + n2 * vv, eps=1e-20)
    else:
        shading_n = geom_n

    position = v0 * w + v1 * uu + v2 * vv

    if mesh.has_uvs:
        t0 = jnp.take(mesh.uvs, idx[0], axis=1)
        t1 = jnp.take(mesh.uvs, idx[1], axis=1)
        t2 = jnp.take(mesh.uvs, idx[2], axis=1)
        uv_out = t0 * w + t1 * uu + t2 * vv
    else:
        uv_out = jnp.stack([u, v], axis=0)

    if mesh.has_materials:
        material_id = jnp.take(mesh.tri_material, tri)
    else:
        material_id = jnp.full(tri.shape, -1, jnp.int32)

    # Normal mapping (mesh_intersection.cuh:213-235).
    if mesh.has_normal_maps:
        mid = jnp.clip(material_id, 0, mesh.mat_tex_ids.shape[1] - 1)
        ntex = jnp.take(mesh.mat_tex_ids[T_NORMAL], mid)
        ntex = jnp.where(material_id >= 0, ntex, -1)
        tex_n, valid = sample_texture(mesh, ntex, uv_out[0], uv_out[1])
        valid &= tex_n[0] >= 0.0
        ts_n = safe_normalize(tex_n * 2.0 - 1.0, eps=1e-20)
        tang, bitang = ortho_basis(shading_n)
        mapped = safe_normalize(
            tang * ts_n[0][None, :] + bitang * ts_n[1][None, :]
            + shading_n * ts_n[2][None, :], eps=1e-20)
        shading_n = where3(valid, mapped, shading_n)

    return HitData(position=position, t=t, shading_normal=shading_n,
                   geometric_normal=geom_n, uv=uv_out, material_id=material_id)


# ---------------------------------------------------------------------------
# Material resolution
# ---------------------------------------------------------------------------

class ResolvedMaterial(NamedTuple):
    base_color: jnp.ndarray   # [3, N]
    metallic: jnp.ndarray     # [N]
    roughness: jnp.ndarray    # [N]
    specular: jnp.ndarray     # [N]
    specular_tint: jnp.ndarray
    anisotropy: jnp.ndarray
    sheen: jnp.ndarray
    sheen_tint: jnp.ndarray
    clearcoat: jnp.ndarray
    clearcoat_gloss: jnp.ndarray
    emission: jnp.ndarray     # [3, N]
    emission_scale: jnp.ndarray
    ior: jnp.ndarray
    specular_transmission: jnp.ndarray


def resolve_material(mesh, material_id, uv, global_scalars) -> ResolvedMaterial:
    """Per-hit material resolution (mesh_intersection.cuh:316-337).

    material_id < 0 (or mesh without materials) falls back to
    `global_scalars` [NUM_SCALARS]; textured base_color and scalar channels
    sample the atlas. All table pulls are per-scalar [N] gathers.
    """
    n = material_id.shape[0]
    use_mesh = (material_id >= 0) & bool(mesh.has_materials)
    mid = jnp.clip(material_id, 0, mesh.mat_scalars.shape[1] - 1)

    def scalar(k):
        row = jnp.take(mesh.mat_scalars[k], mid)
        return jnp.where(use_mesh, row, global_scalars[k])

    base_color = vec3(scalar(P_BASE_R), scalar(P_BASE_G), scalar(P_BASE_B))
    metallic = scalar(P_METALLIC)
    roughness = scalar(P_ROUGHNESS)
    specular = scalar(P_SPECULAR)

    if mesh.has_textures:
        def tex_slot(slot):
            tid = jnp.take(mesh.mat_tex_ids[slot], mid)
            return jnp.where(use_mesh, tid, -1)

        def tex_scalar(slot, const):
            tid = tex_slot(slot)
            rgb, valid = sample_texture(mesh, tid, uv[0], uv[1])
            ch = jnp.clip(jnp.take(mesh.mat_tex_chans[slot], mid), 0, 2)
            val = jnp.take_along_axis(rgb, ch[None, :], axis=0)[0]
            return jnp.where(valid, val, const)

        tid_bc = tex_slot(T_BASE_COLOR)
        rgb_bc, valid_bc = sample_texture(mesh, tid_bc, uv[0], uv[1])
        base_color = where3(valid_bc, rgb_bc, base_color)
        metallic = tex_scalar(T_METALLIC, metallic)
        roughness = tex_scalar(T_ROUGHNESS, roughness)
        specular = tex_scalar(T_SPECULAR, specular)

    return ResolvedMaterial(
        base_color=base_color,
        metallic=metallic,
        roughness=roughness,
        specular=specular,
        specular_tint=scalar(P_SPECULAR_TINT),
        anisotropy=scalar(P_ANISOTROPY),
        sheen=scalar(P_SHEEN),
        sheen_tint=scalar(P_SHEEN_TINT),
        clearcoat=scalar(P_CLEARCOAT),
        clearcoat_gloss=scalar(P_CLEARCOAT_GLOSS),
        emission=vec3(scalar(P_EMISSION_R), scalar(P_EMISSION_G),
                      scalar(P_EMISSION_B)),
        emission_scale=scalar(P_EMISSION_SCALE),
        ior=scalar(P_IOR),
        specular_transmission=scalar(P_SPEC_TRANS),
    )

"""Textured material paths: atlas sampling, per-hit resolution, normal maps.

(ref: sampleTextureRawDev / sampleMaterialParam / resolveMaterial,
mesh_intersection.cuh:109-337). These paths are exercised by glTF scenes with
PBR textures; here they get direct unit coverage with a synthetic quad.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neural_renderer_tpu.ops import traversal
from neural_renderer_tpu.ops.intersect import (
    compute_hit_data, resolve_material, sample_texture)
from neural_renderer_tpu.scene.materials import Material, MaterialParam, \
    MaterialParamVec3
from neural_renderer_tpu.scene.mesh import Mesh


def _textured_quad(nearest=False, with_normal_map=False):
    """Unit quad in z=0 with uv spanning [0,1]^2 and a 4x4 color texture."""
    mesh = Mesh()
    mesh.vertices = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    mesh.normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    mesh.texcoords = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    mesh.indices = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)

    # Texture 0: gradient color; texture 1: constant tangent-space normal
    # tilted toward +x ((n+1)/2 encoding).
    tex = np.zeros((4, 4, 3), np.uint8)
    tex[..., 0] = (np.arange(4)[None, :] * 85)       # R ramps with u
    tex[..., 1] = (np.arange(4)[:, None] * 85)       # G ramps with v
    tex[..., 2] = 255                                # B constant 1.0
    mesh.textures.append(tex)
    nmap = np.zeros((2, 2, 3), np.uint8)
    tilted = (np.array([0.6, 0.0, 0.8]) + 1.0) / 2.0 * 255.0
    nmap[:] = tilted.astype(np.uint8)
    mesh.textures.append(nmap)

    mat = Material.default()
    mat.base_color = MaterialParamVec3.texture(0)
    mat.metallic = MaterialParam.texture(0, channel=2)   # B channel = 1.0
    mat.roughness = MaterialParam.constant(0.25)
    if with_normal_map:
        mat.normal = MaterialParamVec3.texture(1)
    mesh.materials = [mat]
    mesh.material_map = np.zeros(1, np.uint32)
    mesh.material_ids = np.zeros(1, np.int32)
    mesh.has_mesh_materials = True
    mesh.texture_nearest = nearest
    return mesh


def test_sample_texture_bilinear_and_nearest():
    arrays = _textured_quad(nearest=False).to_arrays()
    tex_id = jnp.zeros(3, jnp.int32)
    u = jnp.asarray([0.0, 1.0, 0.5])
    v = jnp.asarray([0.0, 0.0, 0.5])
    rgb, valid = sample_texture(arrays, tex_id, u, v)
    assert bool(valid.all())
    rgb = np.asarray(rgb)
    assert rgb[0, 0] == pytest.approx(0.0, abs=1e-6)   # u=0 -> R 0
    # u=1 WRAPS to 0 (fract wrap, mesh_intersection.cuh:117-118).
    assert rgb[0, 1] == pytest.approx(0.0, abs=1e-6)
    # u=v=0.5 bilinear over texel centers: x=1.5 -> (1+2)/2 * 85/255.
    assert rgb[0, 2] == pytest.approx(1.5 * 85 / 255.0, abs=1e-6)
    assert rgb[2, 2] == pytest.approx(1.0, abs=1e-6)   # B constant
    # Invalid id -> valid False.
    _, valid2 = sample_texture(arrays, jnp.asarray([-1]), u[:1], v[:1])
    assert not bool(valid2[0])

    arrays_n = _textured_quad(nearest=True).to_arrays()
    rgbn, _ = sample_texture(arrays_n, tex_id, u, v)
    # Nearest at u=0.5 picks texel 2: R = 2*85/255.
    assert float(rgbn[0, 2]) == pytest.approx(2 * 85 / 255.0, abs=1e-6)


def test_resolve_material_textured_hit():
    arrays = _textured_quad().to_arrays()
    # Ray at uv ~ (0.75, 0.25): hits triangle 0 region.
    o = jnp.asarray([[0.5], [-0.5], [3.0]], jnp.float32)
    d = jnp.asarray([[0.0], [0.0], [-1.0]], jnp.float32)
    res = traversal.trace_mesh(arrays, o, d, traversal.ANY)
    assert bool(res.hit[0])
    hd = compute_hit_data(arrays, o, d, res.tri, res.u, res.v, res.t)
    uv = np.asarray(hd.uv)[:, 0]
    assert uv[0] == pytest.approx(0.75, abs=1e-5)
    assert uv[1] == pytest.approx(0.25, abs=1e-5)

    global_row = jnp.asarray(Material.default().scalar_row())
    rm = resolve_material(arrays, hd.material_id, hd.uv, global_row)
    # Bilinear gradient: R(u=0.75) = 0.75*(3*85/255) = ... interpolate over
    # texel centers: x = u*(w-1) = 2.25 -> between texels 2 and 3.
    expected_r = (0.75 * 3) * 85 / 255.0  # x = u*(w-1) = 2.25
    assert float(rm.base_color[0, 0]) == pytest.approx(expected_r, abs=1e-6)
    # metallic from B channel = 1.0; roughness constant 0.25.
    assert float(rm.metallic[0]) == pytest.approx(1.0, abs=1e-6)
    assert float(rm.roughness[0]) == pytest.approx(0.25, abs=1e-6)


def test_normal_map_applied():
    arrays = _textured_quad(with_normal_map=True).to_arrays()
    assert arrays.has_normal_maps
    o = jnp.asarray([[0.0], [0.0], [3.0]], jnp.float32)
    d = jnp.asarray([[0.0], [0.0], [-1.0]], jnp.float32)
    res = traversal.trace_mesh(arrays, o, d, traversal.ANY)
    hd = compute_hit_data(arrays, o, d, res.tri, res.u, res.v, res.t)
    n = np.asarray(hd.shading_normal)[:, 0]
    # Tangent-space (0.6, 0, 0.8) mapped through the TBN of a +z normal:
    # stays unit, tilted away from pure +z.
    assert np.linalg.norm(n) == pytest.approx(1.0, abs=1e-3)
    assert n[2] == pytest.approx(0.8, abs=0.05)
    assert abs(n[0]) + abs(n[1]) > 0.5

    # Without the map the shading normal is exactly +z.
    arrays_plain = _textured_quad(with_normal_map=False).to_arrays()
    hd2 = compute_hit_data(arrays_plain, o, d, res.tri, res.u, res.v, res.t)
    np.testing.assert_allclose(np.asarray(hd2.shading_normal)[:, 0],
                               [0, 0, 1], atol=1e-5)

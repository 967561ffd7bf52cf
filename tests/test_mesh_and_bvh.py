"""Mesh container, loaders, and SAH BVH builder tests.

The BVH validation follows SURVEY.md §7 step 2: every ray must hit the same
triangle as brute-force intersection.
"""

import numpy as np
import pytest

from neural_renderer_tpu.scene.bvh import build_bvh, remap_material_ranges
from neural_renderer_tpu.scene.mesh import Mesh
from neural_renderer_tpu.scene.mesh_loader import (
    generate_uv_sphere, load_mesh_auto, load_obj)


def test_uv_sphere_shape():
    mesh = generate_uv_sphere(8, 16, 2.0)
    assert mesh.num_vertices == (8 + 1) * (16 + 1)
    assert mesh.num_triangles == 8 * 16 * 2
    radii = np.linalg.norm(mesh.vertices, axis=1)
    np.testing.assert_allclose(radii, 2.0, atol=1e-5)
    # Normals point outward.
    np.testing.assert_allclose(mesh.normals * 2.0, mesh.vertices, atol=1e-5)
    assert mesh.material_ids.tolist() == [-1]


def test_normalize_mesh():
    mesh = generate_uv_sphere(8, 16, 3.0)
    mesh.vertices += np.array([10.0, -5.0, 2.0], dtype=np.float32)
    mesh.normalize()
    vmin = mesh.vertices.min(axis=0)
    vmax = mesh.vertices.max(axis=0)
    assert float((vmax - vmin).max()) == pytest.approx(10.0, rel=1e-5)
    np.testing.assert_allclose((vmin + vmax) / 2, 0.0, atol=1e-4)


def test_obj_loader(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
f 1//1 2//1 3//1
f 2//1 4//1 3//1
""")
    mesh = load_obj(str(obj))
    assert mesh.num_triangles == 2
    assert mesh.num_vertices == 4
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 4, atol=1e-6)
    assert not mesh.has_mesh_materials


def test_obj_loader_quads_and_negative_indices(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text("""
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f -4 -3 -2 -1
""")
    mesh = load_obj(str(obj))
    assert mesh.num_triangles == 2  # fan triangulation
    # Generated smooth normals should be +Z or -Z unit.
    np.testing.assert_allclose(np.abs(mesh.normals[:, 2]), 1.0, atol=1e-6)


def test_obj_generates_smooth_normals(tmp_path):
    sphere = generate_uv_sphere(12, 24, 1.0)
    obj = tmp_path / "sphere.obj"
    lines = [f"v {v[0]} {v[1]} {v[2]}" for v in sphere.vertices]
    lines += [f"f {int(i[0]) + 1} {int(i[1]) + 1} {int(i[2]) + 1}"
              for i in sphere.indices]
    obj.write_text("\n".join(lines))
    mesh = load_mesh_auto(str(obj))
    # Smooth normals on a sphere approximate the radial direction (up to a
    # global sign set by the fixture's winding, which faces inward — same as
    # the reference's GenerateUvSphere winding).
    dots = np.sum(mesh.normals * (mesh.vertices /
                                  np.linalg.norm(mesh.vertices, axis=1, keepdims=True)),
                  axis=1)
    assert np.mean(np.abs(dots)) > 0.97


# ---------------------------------------------------------------------------
# BVH
# ---------------------------------------------------------------------------

def _ray_tri_brute(origin, direction, tri_verts):
    """Brute-force closest hit over all triangles (Möller-Trumbore)."""
    v0 = tri_verts[:, 0]
    e1 = tri_verts[:, 1] - v0
    e2 = tri_verts[:, 2] - v0
    pvec = np.cross(direction, e2)
    det = np.sum(e1 * pvec, axis=1)
    ok = np.abs(det) >= 1e-8
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = origin - v0
    u = np.sum(tvec * pvec, axis=1) * inv_det
    qvec = np.cross(tvec, e1)
    v = np.sum(direction * qvec, axis=1) * inv_det
    t = np.sum(e2 * qvec, axis=1) * inv_det
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
    t = np.where(hit, t, np.inf)
    best = int(np.argmin(t))
    return (t[best], best) if np.isfinite(t[best]) else (np.inf, -1)


def _bvh_trace(bvh, tri_verts, origin, direction):
    """Host-side reference traversal over the flat BVH arrays."""
    inv = 1.0 / direction
    best_t, best_tri = np.inf, -1
    stack = [0]
    while stack:
        node = stack.pop()
        bmin = bvh.bounds_min[node] - 1e-10
        bmax = bvh.bounds_max[node] + 1e-10
        t1 = (bmin - origin) * inv
        t2 = (bmax - origin) * inv
        tmin = np.minimum(t1, t2).max()
        tmax = np.maximum(t1, t2).min()
        if tmax < 0 or tmin > best_t or tmin > tmax:
            continue
        if bvh.is_leaf[node]:
            s, c = int(bvh.first[node]), int(bvh.count[node])
            for i in range(s, s + c):
                t, _ = _ray_tri_brute(origin, direction, tri_verts[i:i + 1])
                if t < best_t:
                    best_t, best_tri = t, i
        else:
            stack.append(int(bvh.left[node]))
            stack.append(int(bvh.right[node]))
    return best_t, best_tri


def test_bvh_vs_bruteforce(rng):
    mesh = generate_uv_sphere(10, 20, 1.0)
    tri = mesh.vertices[mesh.indices.astype(np.int64)]
    bvh, perm = build_bvh(tri.min(axis=1), tri.max(axis=1))
    tri_reordered = tri[perm]

    assert bvh.is_leaf.sum() >= 1
    # Leaves must cover exactly [0, T).
    leaf = bvh.is_leaf.astype(bool)
    cover = np.zeros(mesh.num_triangles, dtype=int)
    for f, c in zip(bvh.first[leaf], bvh.count[leaf]):
        cover[f:f + c] += 1
    assert (cover == 1).all()

    for _ in range(50):
        origin = rng.normal(size=3) * 3.0
        target = rng.normal(size=3) * 0.3
        d = target - origin
        d = d / np.linalg.norm(d)
        t_ref, _ = _ray_tri_brute(origin, d, tri_reordered)
        t_bvh, _ = _bvh_trace(bvh, tri_reordered, origin, d)
        if np.isinf(t_ref):
            assert np.isinf(t_bvh)
        else:
            assert t_bvh == pytest.approx(t_ref, rel=1e-5)


def test_bvh_reorder_preserves_triangles():
    mesh = generate_uv_sphere(6, 12, 1.0)
    before = {tuple(sorted(map(int, t))) for t in mesh.indices}
    mesh.build_bvh()
    after = {tuple(sorted(map(int, t))) for t in mesh.indices}
    assert before == after


def test_material_range_remap():
    # 6 triangles in 3 primitives: [0,2)->mat 5, [2,5)->mat 7, [5,6)->mat 5.
    material_map = np.array([0, 2, 5], dtype=np.uint32)
    material_ids = np.array([5, 7, 5], dtype=np.int32)
    perm = np.array([3, 0, 5, 2, 4, 1])  # new order -> old index
    new_map, new_ids, per_tri = remap_material_ranges(
        material_map, material_ids, perm, 6)
    expected_per_tri = np.array([7, 5, 5, 7, 7, 5])
    np.testing.assert_array_equal(per_tri, expected_per_tri)
    np.testing.assert_array_equal(new_map, [0, 1, 3, 5])
    np.testing.assert_array_equal(new_ids, [7, 5, 7, 5])


def test_mesh_to_arrays():
    mesh = generate_uv_sphere(6, 12, 1.0)
    arrays = mesh.to_arrays()
    assert arrays.num_triangles == mesh.num_triangles
    assert arrays.has_normals and arrays.has_uvs
    assert not arrays.has_materials
    assert not arrays.is_empty
    assert arrays.max_depth >= 2
    assert (np.asarray(arrays.tri_material) == -1).all()


def test_empty_mesh_to_arrays():
    arrays = Mesh().to_arrays()
    assert arrays.is_empty
    assert arrays.indices.shape == (3, 1)

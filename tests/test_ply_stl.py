"""PLY / STL loader tests (the reference loads these through Assimp —
mesh_loader.cpp:697-713; parity via scene/ply_stl_loader.py)."""

import struct

import numpy as np
import pytest

from neural_renderer_tpu.scene.mesh_loader import (MeshLoadError,
                                                   load_mesh_auto)

# A unit tetrahedron: 4 vertices, 4 faces.
TET_V = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
TET_F = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.uint32)


def _check_tet(mesh, welded=True):
    assert mesh.num_triangles == 4
    if welded:
        assert len(mesh.vertices) == 4
        got = set(map(tuple, np.round(mesh.vertices, 5)))
        assert got == set(map(tuple, TET_V))
    lens = np.linalg.norm(mesh.normals, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    assert mesh.material_ids.tolist() == [-1]


def test_ascii_ply(tmp_path):
    lines = ["ply", "format ascii 1.0",
             "element vertex 4",
             "property float x", "property float y", "property float z",
             "element face 4",
             "property list uchar int vertex_indices",
             "end_header"]
    lines += [" ".join(f"{c:.1f}" for c in v) for v in TET_V]
    lines += ["3 " + " ".join(map(str, f)) for f in TET_F]
    p = tmp_path / "tet.ply"
    p.write_text("\n".join(lines) + "\n")
    _check_tet(load_mesh_auto(str(p)))


def test_ascii_ply_quads_and_extra_props(tmp_path):
    """Quad faces fan-triangulate; unknown vertex properties are skipped."""
    quad_v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    lines = ["ply", "format ascii 1.0",
             "element vertex 4",
             "property float x", "property float y", "property float z",
             "property uchar red",
             "element face 1",
             "property list uchar int vertex_indices",
             "end_header"]
    lines += [" ".join(f"{c:.1f}" for c in v) + " 255" for v in quad_v]
    lines += ["4 0 1 2 3"]
    p = tmp_path / "quad.ply"
    p.write_text("\n".join(lines) + "\n")
    mesh = load_mesh_auto(str(p))
    assert mesh.num_triangles == 2
    np.testing.assert_array_equal(mesh.indices,
                                  [[0, 1, 2], [0, 2, 3]])


def test_binary_ply_with_normals(tmp_path):
    header = ("ply\nformat binary_little_endian 1.0\n"
              "element vertex 4\n"
              "property float x\nproperty float y\nproperty float z\n"
              "property float nx\nproperty float ny\nproperty float nz\n"
              "element face 4\n"
              "property list uchar uint vertex_indices\n"
              "end_header\n").encode()
    nrm = TET_V / np.maximum(np.linalg.norm(TET_V, axis=1, keepdims=True), 1)
    nrm[0] = [0, 1, 0]
    body = b""
    for v, n in zip(TET_V, nrm):
        body += struct.pack("<6f", *v, *n)
    for f in TET_F:
        body += struct.pack("<B3I", 3, *f)
    p = tmp_path / "tet_bin.ply"
    p.write_bytes(header + body)
    mesh = load_mesh_auto(str(p))
    _check_tet(mesh)
    # File-provided normals are kept (not regenerated).
    np.testing.assert_allclose(mesh.normals, nrm, atol=1e-6)


def test_binary_stl(tmp_path):
    body = struct.pack("<80sI", b"bin tet", 4)
    for f in TET_F:
        tri = TET_V[f]
        body += struct.pack("<3f", 0, 0, 1)  # facet normal (ignored)
        for v in tri:
            body += struct.pack("<3f", *v)
        body += struct.pack("<H", 0)
    p = tmp_path / "tet.stl"
    p.write_bytes(body)
    _check_tet(load_mesh_auto(str(p)))


def test_ascii_stl(tmp_path):
    out = ["solid tet"]
    for f in TET_F:
        out.append(" facet normal 0 0 1")
        out.append("  outer loop")
        for v in TET_V[f]:
            out.append(f"   vertex {v[0]} {v[1]} {v[2]}")
        out.append("  endloop")
        out.append(" endfacet")
    out.append("endsolid tet")
    p = tmp_path / "tet_ascii.stl"
    p.write_text("\n".join(out) + "\n")
    _check_tet(load_mesh_auto(str(p)))


def test_malformed_ply_raises(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_text("ply\nformat ascii 1.0\nelement vertex 1\n"
                 "property float x\nproperty float y\nproperty float z\n"
                 "element face 1\nproperty list uchar int vertex_indices\n"
                 "end_header\n0 0 0\n3 0 1 2\n")  # index out of range
    with pytest.raises(MeshLoadError):
        load_mesh_auto(str(p))


def test_loaded_ply_renders(tmp_path):
    """A PLY mesh goes through BVH build + GT render like any other mesh."""
    import jax.numpy as jnp
    from neural_renderer_tpu.render.params import RenderParams
    from neural_renderer_tpu.render.pathtrace import render_gt_frame
    from neural_renderer_tpu.scene.envmap import EnvironmentMap
    from neural_renderer_tpu.scene.materials import Material

    # Icosahedron-ish blob: the tet, scaled up.
    lines = ["ply", "format ascii 1.0", "element vertex 4",
             "property float x", "property float y", "property float z",
             "element face 4", "property list uchar int vertex_indices",
             "end_header"]
    lines += [" ".join(f"{c * 2.0:.1f}" for c in v) for v in TET_V]
    lines += ["3 " + " ".join(map(str, f)) for f in TET_F]
    p = tmp_path / "blob.ply"
    p.write_text("\n".join(lines) + "\n")
    mesh = load_mesh_auto(str(p))

    params = RenderParams.make(
        width=24, height=16, samples_per_pixel=1, max_bounces=1,
        cam_pos=[0.5, 0.5, 4.0], cam_forward=[0, 0, -1.0],
        cam_right=[1, 0, 0.0], cam_up=[0, 1, 0.0], fov_y=1.0,
        material=Material.default(), scene_scale=2.0)
    env = EnvironmentMap().to_arrays()
    accum = jnp.zeros((3, params.pixel_count), jnp.float32)
    img, _ = render_gt_frame(mesh.to_arrays(), env, params, accum)
    img = np.asarray(img)
    assert img.shape == (16, 24, 3)
    assert img.std() > 0

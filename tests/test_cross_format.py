"""Cross-format loader consistency: the same knot-tube geometry written as
OBJ, binary PLY, and binary STL must load as the same triangle set.
Coordinates are serialized with %.9g (exact f32 round-trip), so the
comparison is EXACT — any quantization or index-handling bug in one loader
breaks set equality with the other two."""

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from make_knot_scene import knot_centerline, tube_mesh

from neural_renderer_tpu.scene.mesh_loader import load_mesh_auto


def _canonical_tris(mesh):
    """Set of triangles as cyclic-rotation-normalized coordinate tuples
    (winding preserved, vertex-order and index-layout independent)."""
    t = mesh.vertices[mesh.indices.astype(int)]  # [T, 3, 3] f32
    out = []
    for tri in t:
        k = min(range(3), key=lambda i: tuple(tri[i]))
        out.append(tuple(map(tuple, np.roll(tri, -k, axis=0))))
    return sorted(out)


def test_knot_obj_ply_stl_identical(tmp_path):
    v, n, idx = tube_mesh(knot_centerline(64), 0.3, 8)
    v = v.astype(np.float32)
    n = n.astype(np.float32)
    idx = idx.astype(np.uint32)

    obj = tmp_path / "k.obj"
    with open(obj, "w") as f:
        for p in v:
            f.write(f"v {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        for p in n:
            f.write(f"vn {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        for a, b, c in idx.astype(int) + 1:
            f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")

    ply = tmp_path / "k.ply"
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {len(v)}\n"
              "property float x\nproperty float y\nproperty float z\n"
              "property float nx\nproperty float ny\nproperty float nz\n"
              f"element face {len(idx)}\n"
              "property list uchar uint vertex_indices\n"
              "end_header\n").encode()
    body = b"".join(struct.pack("<6f", *p, *q) for p, q in zip(v, n))
    body += b"".join(struct.pack("<B3I", 3, *f) for f in idx.astype(int))
    ply.write_bytes(header + body)

    stl = tmp_path / "k.stl"
    sbody = struct.pack("<80sI", b"knot", len(idx))
    for f in idx.astype(int):
        sbody += struct.pack("<3f", 0, 0, 1)
        for p in v[f]:
            sbody += struct.pack("<3f", *p)
        sbody += struct.pack("<H", 0)
    stl.write_bytes(sbody)

    m_obj = load_mesh_auto(str(obj))
    m_ply = load_mesh_auto(str(ply))
    m_stl = load_mesh_auto(str(stl))

    assert m_obj.num_triangles == m_ply.num_triangles == \
        m_stl.num_triangles == len(idx)
    # STL has no index sharing; the loader's weld must recover the exact
    # vertex count (the tube has no duplicate positions).
    assert m_stl.num_vertices == len(v)

    s_obj = _canonical_tris(m_obj)
    assert s_obj == _canonical_tris(m_ply)
    assert s_obj == _canonical_tris(m_stl)

    # OBJ + PLY carry the file's unit radial normals (OBJ re-normalizes —
    # a no-op on unit input up to f32 rounding).
    np.testing.assert_allclose(m_ply.normals, n, atol=0)
    t = m_obj.vertices[m_obj.indices.astype(int)]
    gn = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
    gn /= np.linalg.norm(gn, axis=1, keepdims=True)
    cos = np.einsum("ij,ij->i", gn, m_obj.normals[m_obj.indices[:, 0]])
    assert cos.min() > 0.2  # consistently outward in every format path

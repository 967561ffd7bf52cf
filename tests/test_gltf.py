"""glTF 2.0 loader tests against programmatically built GLB/glTF assets
(the parser is self-contained — no TinyGLTF; mesh_loader.cpp:160-604
semantics)."""

import base64
import json
import struct

import numpy as np
import pytest

from neural_renderer_tpu.scene.mesh_loader import load_gltf_with_materials


def _build_gltf_dict(buffer_len, use_uri=None):
    return {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"mesh": 0, "translation": [1.0, 2.0, 3.0], "children": [1]},
            {"mesh": 0, "scale": [2.0, 2.0, 2.0]},
        ],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
                "material": 0,
            }],
        }],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.5, 0.1, 1.0],
                "metallicFactor": 0.7,
                "roughnessFactor": 0.3,
            },
            "emissiveFactor": [0.1, 0.2, 0.3],
            "extensions": {
                "KHR_materials_ior": {"ior": 1.33},
                "KHR_materials_transmission": {"transmissionFactor": 0.25},
                "KHR_materials_emissive_strength": {"emissiveStrength": 4.0},
            },
        }],
        "buffers": [{"byteLength": buffer_len, **({"uri": use_uri} if use_uri else {})}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},          # pos
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},         # norm
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},         # uv
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},          # idx u16
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
    }


def _binary_payload():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    norm = np.array([[0, 0, 1]] * 3, np.float32)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    payload = pos.tobytes() + norm.tobytes() + uv.tobytes() + idx.tobytes()
    # GLB BIN chunks pad to 4 bytes.
    payload += b"\x00" * (-len(payload) % 4)
    return payload


def _write_glb(path):
    payload = _binary_payload()
    gltf = _build_gltf_dict(len(payload))
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    total = 12 + 8 + len(js) + 8 + len(payload)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(payload), 0x004E4942))
        f.write(payload)


def test_glb_geometry_materials_and_transforms(tmp_path):
    path = str(tmp_path / "tri.glb")
    _write_glb(path)
    mesh = load_gltf_with_materials(path)

    # Node 0 (translate) + child node 1 (translate then scale): 2 primitives.
    assert mesh.num_triangles == 2
    assert mesh.num_vertices == 6
    assert mesh.has_mesh_materials

    # Node 0: translation by (1,2,3).
    np.testing.assert_allclose(mesh.vertices[0], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(mesh.vertices[1], [2, 2, 3], atol=1e-6)
    # Node 1: parent translation o child scale: v = T(1,2,3) @ S(2) @ p.
    np.testing.assert_allclose(mesh.vertices[4], [3, 2, 3], atol=1e-6)  # (1,0,0)
    # Normals are rotation-only transformed and renormalized.
    np.testing.assert_allclose(mesh.normals[:3], [[0, 0, 1]] * 3, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(mesh.normals, axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(mesh.texcoords[1], [1, 0], atol=1e-6)

    # Per-primitive material ranges (mesh_loader.cpp:466, :563).
    np.testing.assert_array_equal(mesh.material_map, [0, 1])
    np.testing.assert_array_equal(mesh.material_ids, [0, 0])

    mat = mesh.materials[0]
    np.testing.assert_allclose(mat.base_color.value, (0.9, 0.5, 0.1), atol=1e-6)
    assert mat.metallic.value == pytest.approx(0.7)
    assert mat.roughness.value == pytest.approx(0.3)
    # metallicRoughness texture flags force-disabled quirk -> constants only.
    assert not mat.metallic.textured and not mat.roughness.textured
    np.testing.assert_allclose(mat.base_emission.value, (0.1, 0.2, 0.3), atol=1e-6)
    assert mat.ior == pytest.approx(1.33)
    assert mat.specular_transmission == pytest.approx(0.25)
    assert mat.emission_scale == pytest.approx(4.0)


def test_gltf_json_with_data_uri(tmp_path):
    payload = _binary_payload()
    uri = "data:application/octet-stream;base64," + base64.b64encode(payload).decode()
    gltf = _build_gltf_dict(len(payload), use_uri=uri)
    path = tmp_path / "tri.gltf"
    path.write_text(json.dumps(gltf))
    mesh = load_gltf_with_materials(str(path))
    assert mesh.num_triangles == 2
    np.testing.assert_allclose(mesh.vertices[0], [1, 2, 3], atol=1e-6)


def test_gltf_no_triangles_raises(tmp_path):
    gltf = {"asset": {"version": "2.0"}, "scenes": [{"nodes": []}],
            "nodes": [], "meshes": [], "buffers": []}
    path = tmp_path / "empty.gltf"
    path.write_text(json.dumps(gltf))
    from neural_renderer_tpu.scene.mesh_loader import MeshLoadError
    with pytest.raises(MeshLoadError):
        load_gltf_with_materials(str(path))


def test_gltf_sparse_accessor(tmp_path):
    """Sparse POSITION accessor (glTF 2.0 §3.6.2.3): base values from a
    bufferView with overrides at sparse indices — and the zero-base form
    (no bufferView at all, values entirely from the sparse block)."""
    base = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [9, 9, 9]], np.float32)
    override = np.array([[5, 5, 5]], np.float32)         # replaces vertex 3
    sidx = np.array([3], np.uint16)
    idx = np.array([0, 1, 2, 1, 3, 2], np.uint16)
    payload = base.tobytes() + override.tobytes() + sidx.tobytes() + idx.tobytes()
    payload += b"\x00" * (-len(payload) % 4)

    gltf = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1}]}],
        "buffers": [{"byteLength": len(payload)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},    # base pos
            {"buffer": 0, "byteOffset": 48, "byteLength": 12},   # sparse vals
            {"buffer": 0, "byteOffset": 60, "byteLength": 2},    # sparse idx
            {"buffer": 0, "byteOffset": 62, "byteLength": 12},   # indices
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3",
             "sparse": {"count": 1,
                        "indices": {"bufferView": 2, "componentType": 5123},
                        "values": {"bufferView": 1}}},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    total = 12 + 8 + len(js) + 8 + len(payload)
    path = str(tmp_path / "sparse.glb")
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(payload), 0x004E4942))
        f.write(payload)

    mesh = load_gltf_with_materials(path)
    assert mesh.num_triangles == 2
    got = {tuple(v) for v in mesh.vertices.round(3)}
    assert (5.0, 5.0, 5.0) in got          # sparse override applied
    assert (9.0, 9.0, 9.0) not in got      # base value replaced

    # Zero-base variant: accessor with NO bufferView — values default to
    # zeros with sparse overrides on top.
    gltf["accessors"][0] = {
        "componentType": 5126, "count": 4, "type": "VEC3",
        "sparse": {"count": 1,
                   "indices": {"bufferView": 2, "componentType": 5123},
                   "values": {"bufferView": 1}}}
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    total = 12 + 8 + len(js) + 8 + len(payload)
    path2 = str(tmp_path / "sparse0.glb")
    with open(path2, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(payload), 0x004E4942))
        f.write(payload)
    mesh2 = load_gltf_with_materials(path2)
    got2 = {tuple(v) for v in mesh2.vertices.round(3)}
    assert (5.0, 5.0, 5.0) in got2
    assert (0.0, 0.0, 0.0) in got2

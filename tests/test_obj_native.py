"""Native OBJ parser (csrc/obj_parser.cpp) vs the pure-Python oracle
(mesh_loader._parse_obj_python): bit-identical output on every supported
construct, graceful decline (None -> fallback) on inputs the Python parser
raises on."""

import numpy as np
import pytest

from neural_renderer_tpu.scene.mesh_loader import (MeshLoadError,
                                                   _parse_obj_python,
                                                   load_obj)
from neural_renderer_tpu.scene.obj_native import parse_obj_native


def _native_available(tmp_path):
    p = tmp_path / "probe.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    return parse_obj_native(str(p)) is not None


def _assert_same(a, b):
    assert a is not None and b is not None
    for i, (x, y) in enumerate(zip(a, b)):
        if isinstance(x, np.ndarray):
            assert x.dtype == y.dtype and x.shape == y.shape, i
            np.testing.assert_array_equal(x, y, err_msg=f"field {i}")
        else:
            assert x == y, i


CASES = {
    "plain": "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
    "quads_fan": ("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                  "f 1 2 3 4\n"),
    "vt_vn_full": ("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                   "vt 0 0\nvt 1 0\nvt 0 1\n"
                   "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
                   "f 1/1/1 2/2/2 3/3/3\n"),
    "vt_only": ("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt .5 .5\n"
                "f 1/1 2/1 3/1\n"),
    "vn_only_empty_slot": ("v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\n"
                           "f 1//1 2//1 3//1\n"),
    "negative_indices": ("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                         "f -3 -2 -1\n"),
    "mixed_absent": ("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 1\nvn 1 0 0\n"
                     "f 1 2/1 3//1\n"),
    "vt_single_component": ("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0.25\n"
                            "f 1/1 2/1 3/1\n"),
    "extra_face_components": ("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvn 0 0 1\n"
                              "f 1/1/1/9 2/1/1/9 3/1/1/9\n"),
    "crlf_and_comments": ("# header\r\nv 0 0 0\r\nv 1 0 0\r\nv 0 1 0\r\n"
                          "usemtl foo\r\ns off\r\nf 1 2 3\r\n"),
    "no_normals_smooth": ("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
                          "f 1 2 3\nf 1 3 4\n"),
    "shared_vertex_unification": ("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                                  "vn 0 0 1\nvn 0 0 -1\n"
                                  "f 1//1 2//1 3//1\nf 2//2 4//2 3//2\n"
                                  "f 1//1 2//1 4//1\n"),
    "float_formats": ("v 1e-3 -2.5E2 .5\nv +1.0 2 3\nv 0 0 0\n"
                      "f 1 2 3\n"),
    "leading_space_skipped": ("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
                              "  v 9 9 9\n\tvn 1 1 1\nf 1 2 3\n"),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_native_matches_python(tmp_path, name):
    if not _native_available(tmp_path):
        pytest.skip("native OBJ parser unavailable (no g++?)")
    p = tmp_path / f"{name}.obj"
    p.write_text(CASES[name])
    _assert_same(parse_obj_native(str(p)), _parse_obj_python(str(p)))


@pytest.mark.parametrize("bad", [
    "v 0 0 0\n",                              # no faces -> MeshLoadError
    "v 0 0\nf 1 1 1\n",                       # short v line -> ValueError-ish
    "v 0 0 0\nf 1 2 3\n",                     # out-of-range -> IndexError
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 x\n",   # int('x') -> ValueError
    "v 0 0 0\nv 1 0 0\nv 0 1 3x\nf 1 2 3\n",  # float('3x') -> ValueError
    "v 0x1 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",  # hex: float('0x1') raises
    "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt .5 9y\nf 1/1 2/1 3/1\n",  # float('9y')
])
def test_native_declines_what_python_raises(tmp_path, bad):
    if not _native_available(tmp_path):
        pytest.skip("native OBJ parser unavailable (no g++?)")
    p = tmp_path / "bad.obj"
    p.write_text(bad)
    assert parse_obj_native(str(p)) is None
    with pytest.raises(Exception):
        _parse_obj_python(str(p))


def test_load_obj_uses_native_and_env_escape(tmp_path, monkeypatch):
    p = tmp_path / "tri.obj"
    p.write_text(CASES["vt_vn_full"])
    m1 = load_obj(str(p))
    monkeypatch.setenv("NR_NO_NATIVE_OBJ", "1")
    m2 = load_obj(str(p))
    np.testing.assert_array_equal(m1.vertices, m2.vertices)
    np.testing.assert_array_equal(m1.indices, m2.indices)
    np.testing.assert_array_equal(m1.normals, m2.normals)
    np.testing.assert_array_equal(m1.texcoords, m2.texcoords)

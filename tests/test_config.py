"""Config schema + camera matrix math tests (ref: config_loader.cpp)."""

import json
import math

import numpy as np
import pytest

from neural_renderer_tpu.config import (
    ConfigError,
    camera_basis_from_state,
    camera_state_to_matrix,
    load_config,
    matrix_to_camera_state,
)


def _write_config(tmp_path, extra=None):
    cfg = {
        "scene": {
            "original_mesh": {"path": "meshes/orig.obj", "scale": 2.0},
            "inner_shell": {"path": "/abs/inner.obj"},
            "outer_shell": {"path": "meshes/outer.glb", "scale": 0.5},
        },
        "checkpoint_path": "ckpt/weights.bin",
        "environment": {"hdri_path": "env.hdr", "rotation": 90.0, "strength": 2.0},
        "camera": {
            "matrix": [float(v) for v in np.eye(4).T.reshape(-1)],
            "yfov": 0.8,
            "move_speed": 1.5,
        },
        "rendering": {"total_samples": 64, "bounce_count": 2, "width": 320, "height": 240},
        "material": {
            "base_color": [0.5, 0.6, 0.7],
            "roughness": 0.3,
            "metallic": 0.1,
            "use_constant_neural_color": True,
            "constant_neural_color": [0.1, 0.2, 0.3],
        },
        "neural_network": {"log2_hashmap_size": 16, "base_resolution": 32,
                           "use_neural_query": True},
    }
    if extra:
        cfg.update(extra)
    path = tmp_path / "scene.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_load_config_full(tmp_path):
    path = _write_config(tmp_path)
    cfg = load_config(path)
    assert cfg.original_mesh.path == str(tmp_path / "meshes/orig.obj")
    assert cfg.original_mesh.scale == 2.0
    assert cfg.inner_shell.path == "/abs/inner.obj"  # absolute kept as-is
    assert cfg.outer_shell.scale == 0.5
    assert cfg.additional_mesh.path == ""
    assert cfg.checkpoint_path == str(tmp_path / "ckpt/weights.bin")
    assert cfg.environment.rotation == 90.0
    assert cfg.environment.strength == 2.0
    assert cfg.camera.yfov == pytest.approx(0.8)
    assert cfg.camera.move_speed == 1.5
    assert cfg.rendering.total_samples == 64
    assert cfg.rendering.width == 320
    assert cfg.material.base_color == (0.5, 0.6, 0.7)
    assert cfg.material.roughness == 0.3
    assert cfg.material.use_constant_neural_color
    assert cfg.material.constant_neural_color == (0.1, 0.2, 0.3)
    assert cfg.neural_network.log2_hashmap_size == 16
    assert cfg.neural_network.use_neural_query


def test_missing_camera_raises(tmp_path):
    path = tmp_path / "bad.json"
    path.write_text(json.dumps({"scene": {}}))
    with pytest.raises(ConfigError):
        load_config(str(path))


def test_bad_camera_matrix_raises(tmp_path):
    path = tmp_path / "bad.json"
    path.write_text(json.dumps({"camera": {"matrix": [1, 2, 3]}}))
    with pytest.raises(ConfigError):
        load_config(str(path))


def test_defaults(tmp_path):
    path = tmp_path / "minimal.json"
    path.write_text(json.dumps({
        "camera": {"matrix": list(np.eye(4).T.reshape(-1))}}))
    cfg = load_config(str(path))
    assert cfg.rendering.total_samples == 2048
    assert cfg.rendering.bounce_count == 3
    assert cfg.rendering.width == 1920 and cfg.rendering.height == 1080
    assert cfg.material.roughness == 1.0
    assert cfg.neural_network.log2_hashmap_size == 14


def test_camera_matrix_roundtrip():
    pos = np.array([1.0, 2.0, 3.0])
    for yaw, pitch in [(0.0, 0.0), (45.0, 10.0), (-120.0, -30.0), (170.0, 60.0)]:
        m = camera_state_to_matrix(pos, yaw, pitch)
        pos2, yaw2, pitch2 = matrix_to_camera_state(m)
        np.testing.assert_allclose(pos2, pos, atol=1e-4)
        # Yaw wraps at 180.
        dyaw = (yaw2 - yaw + 180.0) % 360.0 - 180.0
        assert abs(dyaw) < 1e-3
        assert abs(pitch2 - pitch) < 1e-3


def test_identity_matrix_state():
    m = np.eye(4, dtype=np.float32).T.reshape(-1)
    pos, yaw, pitch = matrix_to_camera_state(m)
    np.testing.assert_allclose(pos, 0.0, atol=1e-6)
    # Identity view looks down -Z: forward = (0, 0, -1) -> yaw = -90.
    assert yaw == pytest.approx(-90.0)
    assert pitch == pytest.approx(0.0)


def test_camera_basis_orthonormal():
    fwd, right, up, fov = camera_basis_from_state(33.0, -20.0, 1.2)
    assert fov == pytest.approx(1.2)
    for v in (fwd, right, up):
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
    assert abs(np.dot(fwd, right)) < 1e-5
    assert abs(np.dot(fwd, up)) < 1e-5
    assert abs(np.dot(right, up)) < 1e-5
    # right = forward x worldUp convention.
    np.testing.assert_allclose(np.cross(right, fwd), up, atol=1e-5)


def test_basis_matches_matrix_forward():
    # forward reconstructed from yaw/pitch must match the matrix row.
    pos = np.array([0.5, -1.0, 2.0])
    yaw, pitch = 25.0, 40.0
    m = camera_state_to_matrix(pos, yaw, pitch)
    fwd_from_matrix = -np.array([m[2], m[6], m[10]])
    fwd, _, _, _ = camera_basis_from_state(yaw, pitch, 1.0)
    np.testing.assert_allclose(fwd_from_matrix, fwd, atol=1e-5)

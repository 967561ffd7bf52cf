"""CLI entry point tests: compare_images, evaluate (tiny), viewer headless,
input controller."""

import json
import os

import numpy as np
import pytest

from neural_renderer_tpu.cli.compare_images import main as compare_main
from neural_renderer_tpu.cli.input_controller import (
    MAX_PITCH, CameraState, InputController)
from neural_renderer_tpu.metrics import save_png

from util import outward_sphere


def _write_scene(tmp_path, use_neural=False, total_samples=4,
                 width=24, height=16):
    """Tiny OBJ sphere scene + config JSON."""
    def write_obj(mesh, path):
        lines = [f"v {v[0]} {v[1]} {v[2]}" for v in mesh.vertices]
        lines += [f"vn {n[0]} {n[1]} {n[2]}" for n in mesh.normals]
        lines += [f"f {a+1}//{a+1} {b+1}//{b+1} {c+1}//{c+1}"
                  for a, b, c in mesh.indices.astype(int)]
        path.write_text("\n".join(lines))

    write_obj(outward_sphere(8, 16, 1.0), tmp_path / "orig.obj")
    write_obj(outward_sphere(6, 12, 0.8), tmp_path / "inner.obj")
    write_obj(outward_sphere(6, 12, 1.2), tmp_path / "outer.obj")

    from neural_renderer_tpu.config import camera_state_to_matrix
    matrix = camera_state_to_matrix(np.array([0.0, 0.0, 3.0]), -90.0, 0.0)
    config = {
        "scene": {
            "original_mesh": {"path": "orig.obj"},
            "inner_shell": {"path": "inner.obj"},
            "outer_shell": {"path": "outer.obj"},
        },
        "camera": {"matrix": [float(v) for v in matrix], "yfov": 1.0},
        "rendering": {"total_samples": total_samples, "bounce_count": 1,
                      "width": width, "height": height},
        "material": {"base_color": [0.8, 0.8, 0.8], "roughness": 0.6,
                     "use_constant_neural_color": True},
        "neural_network": {"use_neural_query": use_neural},
    }
    cfg_path = tmp_path / "scene.json"
    cfg_path.write_text(json.dumps(config))
    return cfg_path


def test_compare_images_cli(tmp_path, capsys, rng):
    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + 30, 0, 255).astype(np.uint8)
    pa, pb = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    save_png(pa, a)
    save_png(pb, b)
    flip_out = str(tmp_path / "flip.png")
    assert compare_main([pa, pb, flip_out]) == 0
    out = capsys.readouterr().out
    assert "PSNR:" in out and "FLIP:" in out
    assert os.path.exists(flip_out)


def test_compare_images_detects_yflip(tmp_path, capsys, rng):
    a = rng.integers(0, 256, (32, 16, 3), dtype=np.uint8)
    a[:16] //= 4  # asymmetric so the flip matters
    save_png(str(tmp_path / "a.png"), a)
    save_png(str(tmp_path / "b.png"), a[::-1])
    assert compare_main([str(tmp_path / "a.png"), str(tmp_path / "b.png")]) == 0
    out = capsys.readouterr().out
    assert "Detected Y-flipped" in out
    assert "PSNR: 100.00 dB" in out


def test_compare_images_dimension_mismatch(tmp_path, rng):
    save_png(str(tmp_path / "a.png"),
             rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
    save_png(str(tmp_path / "b.png"),
             rng.integers(0, 255, (9, 8, 3), dtype=np.uint8))
    assert compare_main([str(tmp_path / "a.png"), str(tmp_path / "b.png")]) == 1


def test_evaluate_cli_tiny(tmp_path, capsys):
    from neural_renderer_tpu.cli.evaluate import main as evaluate_main
    cfg_path = _write_scene(tmp_path, use_neural=True)
    out_dir = str(tmp_path / "out")
    rc = evaluate_main([str(cfg_path), "--width", "24", "--height", "16",
                        "--output", out_dir, "--batch-spp", "2",
                        "--total-samples", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PSNR:" in out and "FLIP:" in out
    for name in ("ground_truth.png", "neural.png", "flip_error.png"):
        assert os.path.exists(os.path.join(out_dir, name)), name


def test_evaluate_profile_flag(tmp_path, capsys):
    """--profile prints the per-kernel table (PROFILE_KERNELS categories)
    after each pass."""
    from neural_renderer_tpu.cli.evaluate import main as evaluate_main
    cfg_path = _write_scene(tmp_path, use_neural=True, total_samples=2)
    rc = evaluate_main([str(cfg_path), "--width", "24", "--height", "16",
                        "--output", str(tmp_path / "out"), "--batch-spp", "2",
                        "--total-samples", "2", "--profile"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("ns/ray") == 2        # one table per pass
    assert out.count("frame total") == 2
    assert "avg neural calls/ray" in out   # the neural pass's table


def test_viewer_headless_tiny(tmp_path, capsys):
    from neural_renderer_tpu.cli.viewer import main as viewer_main
    cfg_path = _write_scene(tmp_path)
    out_dir = str(tmp_path / "view")
    rc = viewer_main([str(cfg_path), "--headless", "2", "--output", out_dir,
                      "--width", "24", "--height", "16"])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "viewer_final.png"))
    out = capsys.readouterr().out
    assert "Mrays/s" in out


def test_viewer_train_while_render(tmp_path, capsys):
    """Train-while-render: loss is reported and decreases across frames, the
    renderer picks up the refreshed weights (accumulation resets per push),
    and the exit checkpoint is written."""
    from neural_renderer_tpu.cli.viewer import main as viewer_main
    cfg_path = _write_scene(tmp_path, use_neural=True)
    out_dir = str(tmp_path / "view")
    ckpt_dir = str(tmp_path / "live_ckpt")
    rc = viewer_main([str(cfg_path), "--headless", "3", "--output", out_dir,
                      "--width", "24", "--height", "16",
                      "--train-steps", "4", "--train-batch", "512",
                      "--train-ckpt-dir", ckpt_dir])
    assert rc == 0
    out = capsys.readouterr().out
    losses = [float(line.split("loss ")[1])
              for line in out.splitlines() if "loss " in line]
    assert len(losses) == 3 and np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # 12 steps on the tiny sphere must improve
    assert "checkpoint:" in out and os.path.isdir(ckpt_dir)
    # Every frame renders with fresh weights -> accumulation restarts at the
    # configured spp instead of growing (weights-version in _settings_key).
    spp = [int(line.split(": ")[1].split(" spp")[0])
           for line in out.splitlines() if "spp accumulated" in line]
    assert spp == [spp[0]] * 3


# ---------------------------------------------------------------------------
# Input controller
# ---------------------------------------------------------------------------

def test_controller_moves_in_basis():
    c = InputController(CameraState(position=np.zeros(3, np.float32),
                                    yaw=-90.0, pitch=0.0))
    # yaw -90 -> forward = -Z.
    np.testing.assert_allclose(c.basis.forward, [0, 0, -1], atol=1e-6)
    c.apply_keys({"w"}, dt=2.0)
    np.testing.assert_allclose(c.camera.position, [0, 0, -2], atol=1e-5)
    c.apply_keys({"d", "shift"}, dt=1.0)  # shift doubles speed
    np.testing.assert_allclose(c.camera.position, [2, 0, -2], atol=1e-5)
    c.apply_keys({"space"}, dt=0.5)
    np.testing.assert_allclose(c.camera.position, [2, 0.5, -2], atol=1e-5)


def test_controller_pitch_clamp_and_sensitivity():
    c = InputController()
    c.apply_mouse_delta(10.0, 0.0)
    assert c.camera.yaw == pytest.approx(-90.0 + 1.0)  # 0.1 deg/px
    # Wild jumps (> MAX_DELTA px) are ignored, like the recapture guard.
    c.apply_mouse_delta(0.0, 10000.0)
    assert c.camera.pitch == pytest.approx(0.0)
    # Accumulated look-up clamps at +89 deg.
    for _ in range(20):
        c.apply_mouse_delta(0.0, 99.0)
    assert c.camera.pitch == MAX_PITCH


def test_motion_scaler():
    """Interactive preview scaling: drops to 1/4 resolution during motion,
    holds briefly, then restores full resolution; preview frames upscale to
    the display size; drop=1 never changes size."""
    from neural_renderer_tpu.cli.viewer import MotionScaler
    import numpy as np

    s = MotionScaler(1920, 1080, drop=4, hold=0.25)
    assert s.update(False, 0.0) == (1920, 1080)
    assert s.update(True, 1.0) == (480, 270)
    assert s.update(False, 1.1) == (480, 270)    # still within hold
    assert s.update(False, 1.3) == (1920, 1080)  # restored
    up = s.upscale(np.zeros((270, 480, 3), np.uint8))
    assert up.shape == (1080, 1920, 3)
    full = s.upscale(np.zeros((1080, 1920, 3), np.uint8))
    assert full.shape == (1080, 1920, 3)

    s1 = MotionScaler(637, 353, drop=1)
    assert s1.update(True, 0.0) == (637, 353)

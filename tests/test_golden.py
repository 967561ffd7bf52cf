"""Golden-image regression tests.

The reference's de-facto verification is golden self-comparison (SURVEY.md
§4); these tests pin recorded renders so a silent quality regression fails CI
instead of waiting for a human evaluate run.

Goldens are recorded on the TPU (scripts/record_goldens.py). The RNG is
bit-exact by construction (ops/rng.py wang-hash counters), so on the
recording platform the comparison is EXACT u8 equality; other backends get a
small tolerance for FP reassociation/transcendental differences.

The full quality gate (train-checkpoint PSNR/FLIP thresholds) is opt-in:
RUN_QUALITY=1 pytest tests/test_golden.py -k quality
(it renders 64 spp at 480x270 — minutes, not CI material).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
_ON_RECORDING_PLATFORM = jax.default_backend() in ("tpu", "axon")


ALL_FIXTURES = ("gt_lambert_96x54", "gt_path_96x54_spp1_b2",
                "knot_lambert_96x54")


def _scene(scene_dir, config_name):
    from neural_renderer_tpu.config import load_config
    from neural_renderer_tpu.scene.scene import Scene
    cfg = load_config(os.path.join(os.path.dirname(GOLDEN_DIR), os.pardir,
                                   "configs", scene_dir, config_name))
    return cfg, Scene.from_config(cfg, sphere_fallback=False)


def _make_renderer(cfg, scene):
    from neural_renderer_tpu.render import RenderBasis, Renderer
    from neural_renderer_tpu.config import matrix_to_camera_state
    from neural_renderer_tpu.cli.input_controller import (CameraState,
                                                          InputController)
    renderer = Renderer(scene, cfg.neural_network)
    renderer.resize(96, 54)
    renderer.set_bounce_count(2)
    renderer.set_use_neural_query(False)
    pos, yaw, pitch = matrix_to_camera_state(cfg.camera.matrix)
    controller = InputController(CameraState(position=pos, yaw=yaw,
                                             pitch=pitch,
                                             fov_y=cfg.camera.yfov))
    b = controller.basis
    renderer.set_camera_basis(RenderBasis(b.forward, b.right, b.up,
                                          cfg.camera.yfov))
    return renderer, pos


def render_fixtures(names=None) -> dict:
    """name -> u8 image. Deterministic renders only (no trained weights);
    with `names`, only those fixtures are rendered (each golden test pays
    for its own image, not the whole set)."""
    want = set(names if names is not None else ALL_FIXTURES)
    out = {}
    if want & {"gt_lambert_96x54", "gt_path_96x54_spp1_b2"}:
        cfg, scene = _scene("sphere", "sphere.json")
        renderer, pos = _make_renderer(cfg, scene)
        if "gt_lambert_96x54" in want:
            renderer.set_lambert_view(True)
            out["gt_lambert_96x54"] = renderer.render(pos)
        if "gt_path_96x54_spp1_b2" in want:
            renderer.set_lambert_view(False)
            renderer.reset_samples()
            out["gt_path_96x54_spp1_b2"] = renderer.render(pos)
    if "knot_lambert_96x54" in want:
        # 65k-tri trefoil (configs/knot): pins the two-level clustered
        # streaming trace, which the sphere fixtures never reach.
        cfg, scene = _scene("knot", "knot.json")
        renderer, pos = _make_renderer(cfg, scene)
        renderer.set_lambert_view(True)
        out["knot_lambert_96x54"] = renderer.render(pos)
    return out


@pytest.mark.parametrize("name", list(ALL_FIXTURES))
def test_golden_images(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} not recorded "
                    "(run scripts/record_goldens.py on the TPU)")
    import imageio.v2 as imageio
    golden = np.asarray(imageio.imread(path))[..., :3]
    img = render_fixtures([name])[name]
    assert img.shape == golden.shape
    if _ON_RECORDING_PLATFORM:
        np.testing.assert_array_equal(img, golden)
    else:
        diff = np.abs(img.astype(int) - golden.astype(int))
        assert diff.max() <= 2
        assert (diff.sum(axis=-1) > 0).mean() < 0.05


@pytest.mark.skipif(os.environ.get("RUN_QUALITY") != "1",
                    reason="opt-in quality gate (RUN_QUALITY=1): renders "
                           "64 spp at 480x270")
def test_quality_thresholds(capsys):
    """GT-vs-neural PSNR/FLIP on the bundled trained checkpoint must not
    regress below the recorded round-1 level (46.12 dB / 0.0164 FLIP at
    64 spp, BASELINE.md) minus noise margin."""
    import re
    from neural_renderer_tpu.cli import evaluate as eval_cli
    rc = eval_cli.main([os.path.join(os.path.dirname(GOLDEN_DIR), os.pardir,
                                     "configs", "sphere", "sphere.json"),
                        "--width", "480", "--height", "270"])
    out = capsys.readouterr().out
    assert rc == 0
    psnr = re.search(r"PSNR: ([0-9.]+) dB", out)
    flip = re.search(r"FLIP: ([0-9.]+) \(mean\)", out)
    assert psnr and flip, f"evaluate did not report metrics:\n{out[-500:]}"
    assert float(psnr.group(1)) >= 45.5
    assert float(flip.group(1)) <= 0.018


@pytest.mark.skipif(os.environ.get("RUN_QUALITY") != "1",
                    reason="opt-in quality gate (RUN_QUALITY=1): renders "
                           "64 spp at 480x270 against the 65k-tri knot")
def test_quality_thresholds_knot(capsys):
    """Stress-scene gate: non-convex shells + clustered tracing + the
    trained lane checkpoint (recorded 41.45 dB / 0.0145 FLIP with the
    48k-step ckpt, BASELINE.md round 5) minus noise margin. Also pins the
    global-material color supervision — an untrained/grey-supervised color
    head scores ~20 dB here."""
    import re
    from neural_renderer_tpu.cli import evaluate as eval_cli
    rc = eval_cli.main([os.path.join(os.path.dirname(GOLDEN_DIR), os.pardir,
                                     "configs", "knot", "knot_lane.json"),
                        "--width", "480", "--height", "270"])
    out = capsys.readouterr().out
    assert rc == 0
    psnr = re.search(r"PSNR: ([0-9.]+) dB", out)
    flip = re.search(r"FLIP: ([0-9.]+) \(mean\)", out)
    assert psnr and flip, f"evaluate did not report metrics:\n{out[-500:]}"
    assert float(psnr.group(1)) >= 40.2
    assert float(flip.group(1)) <= 0.018


@pytest.mark.skipif(os.environ.get("RUN_QUALITY") != "1",
                    reason="opt-in quality gate (RUN_QUALITY=1)")
def test_quality_thresholds_studio(capsys):
    """Full-feature scene gate (textures + normal maps + PIZ env): recorded
    24.12 dB / 0.0578 FLIP at 480x270 x64 spp after the round-4 scene fixes
    (outward shell winding + slope-parametrized ripple map — BASELINE.md
    round 4; the round-3 19.19 dB record was an inward-winding scene bug).
    Thresholds guard regressions below that record minus noise margin; the
    known bug classes (inverted winding ~16-19 dB, GT-vs-neural additional
    asymmetry 16.1, grey color supervision ~14) all sit well under it."""
    import re
    from neural_renderer_tpu.cli import evaluate as eval_cli
    rc = eval_cli.main([os.path.join(os.path.dirname(GOLDEN_DIR), os.pardir,
                                     "configs", "studio", "studio_lane.json"),
                        "--width", "480", "--height", "270",
                        "--batch-spp", "1", "--no-additional"])
    out = capsys.readouterr().out
    assert rc == 0
    psnr = re.search(r"PSNR: ([0-9.]+) dB", out)
    flip = re.search(r"FLIP: ([0-9.]+) \(mean\)", out)
    assert psnr and flip, f"evaluate did not report metrics:\n{out[-500:]}"
    # s16-12k-b64 ships at 24.36 dB / 0.0540 (BASELINE.md round-5 ablation)
    assert float(psnr.group(1)) >= 23.5
    assert float(flip.group(1)) <= 0.065

"""Default-run quality gates (VERDICT r4 item 8).

The full-resolution quality gates are opt-in (RUN_QUALITY=1, test_golden.py)
because they need the TPU + minutes of rendering — which meant `pytest` never
checked quality by default, and a scene-corruption bug like the round-4
inward-winding regression could land silently. These gates render each
bundled scene TINY (96x54, 4 spp) on whatever backend the suite runs and
assert a GT-vs-neural PSNR floor with the shipped checkpoint.

The floors are ~1 dB under CPU-measured values (recorded below); a drop
past them means scene geometry, checkpoint loading, the march, or the
sampler regressed. GT and neural share primary-ray RNG streams, so the MC
noise largely cancels in the comparison and 4 spp is enough for a stable
PSNR (+-0.2 dB across seeds/platforms).
"""

import os

import numpy as np
import pytest

from neural_renderer_tpu.config import (camera_basis_from_state, load_config,
                                        matrix_to_camera_state)
from neural_renderer_tpu.metrics import compute_psnr
from neural_renderer_tpu.render import RenderBasis, Renderer
from neural_renderer_tpu.scene.scene import Scene

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# scene config -> (psnr_floor_db, measured_db_at_recording)
SCENES = {
    "configs/sphere/sphere_lane.json": (39.5, 40.91),
    "configs/knot/knot_lane.json": (31.2, 32.45),
    "configs/studio/studio_lane.json": (21.0, 22.02),
}


def _tiny_eval(config_path: str, no_additional: bool = True) -> float:
    cfg = load_config(os.path.join(ROOT, config_path))
    pos, yaw, pitch = matrix_to_camera_state(cfg.camera.matrix)
    pos = pos * cfg.original_mesh.scale
    scene = Scene.from_config(cfg, sphere_fallback=False)
    renderer = Renderer(scene, cfg.neural_network)
    renderer.resize(96, 54)
    renderer.set_bounce_count(cfg.rendering.bounce_count)
    renderer.set_envmap_rotation(cfg.environment.rotation)
    if no_additional:
        renderer.set_use_additional_mesh(False)
    assert cfg.checkpoint_path, config_path
    assert renderer.load_weights_from_file(cfg.checkpoint_path), \
        cfg.checkpoint_path
    fwd, right, up, fov = camera_basis_from_state(yaw, pitch, cfg.camera.yfov)
    renderer.set_camera_basis(RenderBasis(fwd, right, up, fov))

    renderer.set_use_neural_query(False)
    gt = renderer.render_accumulate(np.asarray(pos), 4, batch_spp=1)
    renderer.set_use_neural_query(True)
    neural = renderer.render_accumulate(np.asarray(pos), 4, batch_spp=1)
    return float(compute_psnr(gt, neural))


@pytest.mark.parametrize("config", [c for c in SCENES])
def test_tiny_quality_gate(config):
    floor, recorded = SCENES[config]
    if floor is None:
        pytest.skip("floor not yet recorded for this scene")
    psnr = _tiny_eval(config)
    assert psnr >= floor, (
        f"{config}: tiny-eval PSNR {psnr:.2f} dB fell below the {floor} dB "
        f"gate (recorded {recorded} dB) — scene geometry, checkpoint "
        f"loading, or the march regressed")

"""End-to-end TPU-path validation on CPU: force every platform_dependent
dispatch onto its `tpu` branch with NR_PALLAS_INTERPRET=1, so the COMPLETE
production compute path — camera fast-path march with fused dual-shell
sweeps, clustered streaming kernels, the fused lane-grid network kernel,
compaction tiers — executes via Pallas interpret mode, and compare whole
frames against the normal CPU (XLA-twin) path. This is the closest thing to
a TPU integration test that runs without the hardware; only Mosaic lowering
remains uncovered."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.render.neural_frame import render_neural_frame
from neural_renderer_tpu.render.neural_march import NeuralContext
from neural_renderer_tpu.render.params import RenderParams
from neural_renderer_tpu.render.pathtrace import render_gt_frame
from neural_renderer_tpu.scene.envmap import EnvironmentMap
from neural_renderer_tpu.scene.materials import Material
from neural_renderer_tpu.scene.mesh import Mesh

from util import outward_sphere


def _force_tpu_branch(monkeypatch):
    monkeypatch.setenv("NR_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(
        jax.lax, "platform_dependent",
        lambda *args, default=None, **branches: branches["tpu"](*args))


def _params(w, h, bounces, outer):
    omin, omax = outer.bounds()
    return RenderParams.make(
        width=w, height=h, samples_per_pixel=1, max_bounces=bounces,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=0.9, material=Material.default(),
        scene_scale=2.0, outer_shell_min=omin,
        outer_shell_inv_extent=1.0 / (omax - omin))


def _compare(img_tpu, img_cpu, max_diff_frac=0.02, mean_tol=1.0):
    a = np.asarray(img_tpu, np.int32)
    b = np.asarray(img_cpu, np.int32)
    assert a.shape == b.shape
    d = np.abs(a - b)
    # bf16 kernel-vs-XLA rounding (measured 6.6e-4 rel) plus boundary-ray
    # flips: almost all pixels must agree to a few u8 steps.
    assert (d > 3).mean() < max_diff_frac, f"{(d > 3).mean():.4f}"
    assert d.mean() < mean_tol, f"mean {d.mean():.3f}"


@pytest.mark.parametrize("variant", ["default", "mxu", "trace_entry"])
def test_neural_frame_full_tpu_path(monkeypatch, variant):
    """Neural frame (lane-grid kernel + clustered shell sweeps + march fast
    path + bounce compaction) through the forced-TPU interpret path — in the
    default configuration, with the MXU pair-math kernels, and with the
    camera_entry="trace" march variant."""
    if variant == "mxu":
        monkeypatch.setenv("NR_TRACE_MXU", "1")
    if variant == "trace_entry":
        from neural_renderer_tpu.render import neural_march
        monkeypatch.setattr(neural_march, "CAMERA_ENTRY_DEFAULT", "trace")
    outer_m = outward_sphere(24, 48, 1.2)
    inner_m = outward_sphere(24, 48, 0.8)   # 4608 combined -> clustered sweep
    outer = outer_m.to_arrays()
    inner = inner_m.to_arrays()
    cfg = nbvh.NbvhConfig(grid_type="lane", lane_sublanes=8,
                          log2_hashmap_size=10, base_resolution=8)
    net = nbvh.init_params(jax.random.PRNGKey(0), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    add = Mesh().to_arrays()
    env = EnvironmentMap().to_arrays()
    params = _params(40, 24, 1, outer_m)
    accum = jnp.zeros((3, 40 * 24), jnp.float32)

    img_cpu, _ = render_neural_frame(ctx, add, env, params, accum,
                                     use_additional=False,
                                     compute_dtype=jnp.bfloat16)
    _force_tpu_branch(monkeypatch)
    img_tpu, _ = render_neural_frame(ctx, add, env, params, accum,
                                     use_additional=False,
                                     compute_dtype=jnp.bfloat16)
    assert np.asarray(img_tpu).sum() > 0
    _compare(img_tpu, img_cpu)


@pytest.mark.parametrize("variant", ["default", "mxu"])
def test_gt_frame_full_tpu_path(monkeypatch, variant):
    """GT path-traced frame against a 9216-tri mesh — the two-level
    clustered streaming trace end to end, per bounce."""
    if variant == "mxu":
        monkeypatch.setenv("NR_TRACE_MXU", "1")
    mesh_m = outward_sphere(48, 96, 1.0)    # > 4096 tris -> two-level trace
    mesh = mesh_m.to_arrays()
    env = EnvironmentMap().to_arrays()
    params = _params(40, 24, 1, mesh_m)
    accum = jnp.zeros((3, 40 * 24), jnp.float32)

    img_cpu, _ = render_gt_frame(mesh, env, params, accum)
    _force_tpu_branch(monkeypatch)
    img_tpu, _ = render_gt_frame(mesh, env, params, accum)
    assert np.asarray(img_tpu).sum() > 0
    _compare(img_tpu, img_cpu)

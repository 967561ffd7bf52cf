"""Profiler harness + orbax checkpoint restore tests."""

import numpy as np

import jax
import jax.numpy as jnp

from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.render.params import RenderParams
from neural_renderer_tpu.render.profiler import CATEGORIES, profile_gt_frame
from neural_renderer_tpu.scene.envmap import EnvironmentMap
from neural_renderer_tpu.scene.materials import Material
from neural_renderer_tpu.train import (
    TrainConfig, init_train_state, restore_checkpoint, save_checkpoint)

from util import outward_sphere


def test_profile_gt_frame_categories():
    mesh = outward_sphere(6, 12, 1.0).to_arrays()
    env = EnvironmentMap().to_arrays()
    params = RenderParams.make(
        width=8, height=8, samples_per_pixel=1, max_bounces=1,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=1.0, material=Material.default(),
        scene_scale=2.0)
    t = profile_gt_frame(mesh, env, params, runs=1)
    assert len(CATEGORIES) == 13  # the reference's KernelId count
    assert t.ray_count == 64
    # GT branch must populate its categories with nonzero wall time.
    for k in ("primaryTrace", "initPathState", "sampleBounce", "bounceTrace",
              "integrateBounce", "finalize"):
        assert t.ms[k] > 0.0, k
    assert t.frame_total_ms > 0.0
    table = t.table()
    assert "primaryTrace" in table and "ns/ray" in table
    assert t.ns_per_ray("primaryTrace") > 0.0


def test_orbax_checkpoint_roundtrip(tmp_path):
    net_config = nbvh.NbvhConfig(log2_hashmap_size=6, base_resolution=4,
                                 n_levels=2, mlp_width=32, mlp_hidden_layers=2)
    cfg = TrainConfig(batch_size=64)
    state = init_train_state(cfg, net_config)
    state = state._replace(step=jnp.int32(7))
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    restored = restore_checkpoint(path, cfg, net_config)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profile_neural_frame_by_bounce():
    from neural_renderer_tpu.render.neural_march import NeuralContext
    from neural_renderer_tpu.render.profiler import (
        profile_neural_frame_by_bounce)
    from neural_renderer_tpu.scene.mesh import Mesh

    outer = outward_sphere(6, 12, 1.2).to_arrays()
    inner = outward_sphere(6, 12, 0.8).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=6, base_resolution=4, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    ctx = NeuralContext(outer=outer, inner=inner,
                        net_params=nbvh.init_params(jax.random.PRNGKey(0), cfg),
                        config=cfg)
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = RenderParams.make(
        width=8, height=8, samples_per_pixel=1, max_bounces=2,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=1.0, material=Material.default(),
        scene_scale=2.0, outer_shell_min=omin,
        outer_shell_inv_extent=1.0 / (omax - omin))
    env = EnvironmentMap().to_arrays()
    prof = profile_neural_frame_by_bounce(ctx, Mesh().to_arrays(), env,
                                          params, compute_dtype=jnp.float32,
                                          runs=1)
    assert len(prof["frame_ms"]) == 3          # b = 0, 1, 2
    assert len(prof["bounce_ms"]) == 2
    assert all(m > 0 for m in prof["frame_ms"])
    assert prof["ray_count"] == 64

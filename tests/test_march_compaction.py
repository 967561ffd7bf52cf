"""Shell-march compaction: the fixed-capacity gathered path must be
bit-identical to the full masked path (the TPU replacement for the
reference's compactInputsKernel, cuda_renderer_neural.cu:1529-1541)."""

import numpy as np

import jax
import jax.numpy as jnp

from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.render.neural_march import (
    NeuralContext, trace_neural_segments)
from neural_renderer_tpu.render.params import RenderParams
from neural_renderer_tpu.scene.materials import Material

from util import crafted_net_params, outward_sphere


def test_compacted_march_matches_full():
    outer = outward_sphere(12, 24, 1.2).to_arrays()
    inner = outward_sphere(12, 24, 0.8).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = nbvh.init_params(jax.random.PRNGKey(2), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = RenderParams.make(
        width=64, height=64, samples_per_pixel=1, max_bounces=1,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=0.9, material=Material.default(),
        scene_scale=2.0, outer_shell_min=omin,
        outer_shell_inv_extent=1.0 / (omax - omin))

    n = 4096
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 3.0
    t = rng.normal(size=(n, 3)) * 0.5
    d = t - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    oj = jnp.asarray(o.T, jnp.float32)
    dj = jnp.asarray(d.T, jnp.float32)

    # Compare within jit: eagerly, lax.cond branches (the compacted tiers
    # and peel) execute compiled while straight-line code runs op-by-op,
    # which flips FMA contraction at the ulp level (BASELINE.md lesson);
    # production paths are always jitted.
    a = jax.jit(lambda o, d: trace_neural_segments(
        ctx, params, o, d, compute_dtype=jnp.float32,
        compaction=False))(oj, dj)
    b = jax.jit(lambda o, d: trace_neural_segments(
        ctx, params, o, d, compute_dtype=jnp.float32,
        compaction=True))(oj, dj)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    h = np.asarray(a.hit)
    np.testing.assert_array_equal(np.asarray(a.position).T[h],
                                  np.asarray(b.position).T[h])
    np.testing.assert_array_equal(np.asarray(a.distance)[h],
                                  np.asarray(b.distance)[h])
    np.testing.assert_array_equal(np.asarray(a.albedo).T[h],
                                  np.asarray(b.albedo).T[h])
    assert h.sum() > 100


def test_camera_entry_modes_agree():
    """camera_entry="trace" (plain forward entry trace + compacted
    iteration 1) vs "fwd2" (fused entry sweep + derived iteration-1
    crossings): identical semantics, different FP association — hits must
    agree except for boundary-ulp rays. The trace mode's compaction ladder
    (incl. its n/2 tier) must match its own full path to 1 ulp: unlike the
    fwd2 test above (iteration 1 peeled at full batch in both programs),
    here iteration 1 itself runs at prefix shape, and XLA's FMA contraction
    differs per shape."""
    outer = outward_sphere(12, 24, 1.2).to_arrays()
    inner = outward_sphere(12, 24, 0.8).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = nbvh.init_params(jax.random.PRNGKey(2), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = RenderParams.make(
        width=64, height=64, samples_per_pixel=1, max_bounces=1,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=0.9, material=Material.default(),
        scene_scale=2.0, outer_shell_min=omin,
        outer_shell_inv_extent=1.0 / (omax - omin))

    n = 4096
    rng = np.random.default_rng(3)
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 3.0
    t = rng.normal(size=(n, 3)) * 0.5
    # Aim ~70% of rays off the shell so iteration 1's active count lands in
    # the n/2 tier (the tier this test exists to exercise).
    t[rng.random(n) < 0.7] += np.array([10.0, 0.0, 0.0])
    d = t - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    oj = jnp.asarray(o.T, jnp.float32)
    dj = jnp.asarray(d.T, jnp.float32)

    run = jax.jit(lambda mode, comp: trace_neural_segments(
        ctx, params, oj, dj, compute_dtype=jnp.float32, compaction=comp,
        camera_entry=mode), static_argnums=(0, 1))
    a = run("fwd2", False)
    b = run("trace", False)
    bc = run("trace", True)

    # Compaction vs full within the trace mode (ulp-level only).
    np.testing.assert_array_equal(np.asarray(b.hit), np.asarray(bc.hit))
    hb = np.asarray(b.hit)
    np.testing.assert_allclose(np.asarray(b.position).T[hb],
                               np.asarray(bc.position).T[hb],
                               rtol=1e-4, atol=1e-6)

    # Cross-mode agreement (ulp-level drift only).
    ha = np.asarray(a.hit)
    assert (ha != hb).mean() < 0.01
    both = ha & hb
    assert both.sum() > 100
    np.testing.assert_allclose(np.asarray(a.position).T[both],
                               np.asarray(b.position).T[both],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.distance)[both],
                               np.asarray(b.distance)[both],
                               rtol=1e-4, atol=1e-4)


def test_compacted_bounce_stage_matches_full():
    """The whole-bounce-stage compaction in render_neural_frame (early
    termination + march + merge on a gathered prefix) must leave the frame
    bit-identical to the full-batch path."""
    from neural_renderer_tpu.render.neural_frame import render_neural_frame
    from neural_renderer_tpu.scene.envmap import EnvironmentMap
    from neural_renderer_tpu.scene.mesh import Mesh

    outer = outward_sphere(12, 24, 1.2).to_arrays()
    inner = outward_sphere(12, 24, 0.8).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = nbvh.init_params(jax.random.PRNGKey(2), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = RenderParams.make(
        width=64, height=32, samples_per_pixel=1, max_bounces=2,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=0.9, material=Material.default(),
        scene_scale=2.0, outer_shell_min=omin,
        outer_shell_inv_extent=1.0 / (omax - omin))
    env = EnvironmentMap().to_arrays()
    add = Mesh().to_arrays()
    accum = jnp.zeros((3, 64 * 32), jnp.float32)

    img_a, acc_a = render_neural_frame(ctx, add, env, params, accum,
                                       compute_dtype=jnp.float32,
                                       bounce_compaction=False)
    img_b, acc_b = render_neural_frame(ctx, add, env, params, accum,
                                       compute_dtype=jnp.float32,
                                       bounce_compaction=True)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    np.testing.assert_array_equal(np.asarray(acc_a), np.asarray(acc_b))
    assert np.asarray(img_a).std() > 0  # non-degenerate render


def test_dead_bounce_skip_matches_unconditional_loop():
    """Bounces >= 2 are lax.cond-skipped when no path is active
    (neural_frame.py bounce loop). The frame must stay bit-identical to an
    unconditional loop — including when mid-loop bounces ARE dead (tiny
    network + high bounce count kills all paths early)."""
    import functools
    from neural_renderer_tpu.render import neural_frame as nf
    from neural_renderer_tpu.render import pathtrace as pt
    from neural_renderer_tpu.ops import traversal
    from neural_renderer_tpu.render.neural_frame import render_neural_frame
    from neural_renderer_tpu.scene.envmap import EnvironmentMap
    from neural_renderer_tpu.scene.mesh import Mesh

    outer = outward_sphere(12, 24, 1.2).to_arrays()
    inner = outward_sphere(12, 24, 0.8).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = nbvh.init_params(jax.random.PRNGKey(5), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = RenderParams.make(
        width=32, height=16, samples_per_pixel=1, max_bounces=4,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=0.9, material=Material.default(),
        scene_scale=2.0, outer_shell_min=omin,
        outer_shell_inv_extent=1.0 / (omax - omin))
    env = EnvironmentMap().to_arrays()
    add = Mesh().to_arrays()
    accum = jnp.zeros((3, 32 * 16), jnp.float32)

    @jax.jit
    def frame_no_skip(ctx, add, env, params, accum):
        """The pre-skip loop, inlined: every bounce runs unconditionally."""
        pixel_idx, sample_of, _, origins, dirs = pt.primary_rays(params)
        from neural_renderer_tpu.render.neural_march import (
            trace_neural_segments)
        hits = trace_neural_segments(ctx, params, origins, dirs,
                                     camera_rays=True,
                                     compute_dtype=jnp.float32)
        path = pt.init_path_state(params, env, hits, dirs)
        incoming = None
        cur_hits = hits
        for bounce in range(1, params.max_bounces + 1):
            rays = pt.sample_bounce_directions(params, pixel_idx, sample_of,
                                               cur_hits, path.active, incoming)
            path = pt.update_active_after_sampling(path, cur_hits, rays)
            bounce_hits, active = nf._bounce_stage_compacted(
                ctx, params, add, False, jnp.float32, rays, path.active,
                compaction=False)
            path = path._replace(active=active)
            path = pt.integrate_bounce(params, env, path, bounce_hits, rays,
                                       bounce, pixel_idx, sample_of)
            incoming = rays.direction
            cur_hits = bounce_hits
        return pt.finalize(params, path.radiance, accum)

    img_ref, acc_ref = frame_no_skip(ctx, add, env, params, accum)
    img, acc = jax.jit(render_neural_frame,
                       static_argnames=("use_additional", "compute_dtype",
                                        "bounce_compaction"))(
        ctx, add, env, params, accum, compute_dtype=jnp.float32,
        bounce_compaction=False)
    np.testing.assert_array_equal(np.asarray(img_ref), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(acc_ref), np.asarray(acc))

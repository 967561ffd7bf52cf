"""Fused shell sweep: one dense pass over both shells must reproduce the
four separate facing-culled closest-hit traces exactly (an ANY-mode closest
hit == min(fwd closest, bwd closest) since the determinant cull guarantees
facing != 0). Covers the fusion of traceSegmentExitsKernel +
checkBounceEarlyTerminationKernel + traceOuterShellEntryFromRaysKernel
(/root/reference/src/cuda_renderer_neural.cu:858-930, 503-553, 773-852)."""

import numpy as np

import jax
import jax.numpy as jnp

from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.ops import traversal
from neural_renderer_tpu.render import pathtrace as pt
from neural_renderer_tpu.render.neural_march import (
    NeuralContext, bounce_shell_entry_and_early_term,
    check_bounce_early_termination, trace_neural_segments)

from util import outward_sphere


def _random_rays(n, seed=0, spread=3.0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * spread
    t = rng.normal(size=(n, 3)) * 0.5
    d = t - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o.T, jnp.float32), jnp.asarray(d.T, jnp.float32)


def test_sweep_matches_separate_traces():
    outer = outward_sphere(12, 24, 1.2).to_arrays()
    inner = outward_sphere(10, 20, 0.8).to_arrays()
    o, d = _random_rays(2048)

    sw = jax.jit(lambda o, d: traversal.sweep_shells(outer, inner, o, d))(o, d)

    def check(got, mesh, mode):
        # Hit sets must match exactly; t within a few ULP (Mosaic and XLA
        # contract FMAs differently — same convention as test_fused_pallas).
        r = traversal.trace_mesh_brute(mesh, o, d, mode)
        ref = np.where(np.asarray(r.hit), np.asarray(r.t), 1e30)
        g = np.asarray(got)
        np.testing.assert_array_equal(g < 1e30, ref < 1e30)
        h = ref < 1e30
        np.testing.assert_allclose(g[h], ref[h], rtol=2e-6)
        assert h.sum() > 50

    check(sw.outer_fwd, outer, traversal.FORWARD_ONLY)
    check(sw.outer_bwd, outer, traversal.BACKWARD_ONLY)
    check(sw.inner_fwd, inner, traversal.FORWARD_ONLY)
    check(sw.inner_bwd, inner, traversal.BACKWARD_ONLY)
    # ANY-mode equivalence used by the fused callers.
    check(jnp.minimum(sw.inner_fwd, sw.inner_bwd), inner, traversal.ANY)


def test_sweep_fwd2_matches_bruteforce():
    """with_fwd2: outer_fwd2 must equal the second-smallest accepted forward
    crossing (numpy oracle over every triangle). A convex shell has at most
    ONE forward crossing per ray, so the outer here is two nested spheres
    merged into one mesh — rays through both walls get two."""
    s_out = outward_sphere(12, 24, 1.2)
    s_mid = outward_sphere(10, 20, 1.0)
    merged = outward_sphere(12, 24, 1.2)
    nv = s_out.vertices.shape[0]
    merged.vertices = np.concatenate([s_out.vertices, s_mid.vertices], axis=0)
    merged.normals = np.concatenate([s_out.normals, s_mid.normals], axis=0)
    merged.indices = np.concatenate(
        [s_out.indices, s_mid.indices + nv], axis=0).astype(np.uint32)
    merged.mark_dirty()
    outer = merged.to_arrays()
    inner = outward_sphere(10, 20, 0.6).to_arrays()
    o, d = _random_rays(2048, seed=11)
    sw = jax.jit(lambda o, d: traversal.sweep_shells(outer, inner, o, d,
                                                     with_fwd2=True))(o, d)

    # Oracle: per-ray sorted list of accepted forward t's.
    tp = np.asarray(outer.tris_packed)
    on, dn = np.asarray(o), np.asarray(d)
    v0 = tp[0:3][:, None, :]                      # [3, 1, T]
    e1 = tp[3:6][:, None, :]
    e2 = tp[6:9][:, None, :]
    dN = dn[:, :, None]
    oN = on[:, :, None]
    pv = np.cross(dN, e2, axis=0)
    det = np.sum(e1 * pv, axis=0)
    ok = np.abs(det) >= traversal.TRI_EPSILON
    inv = 1.0 / np.where(ok, det, 1.0)
    tv = oN - v0
    u = np.sum(tv * pv, axis=0) * inv
    ok &= (u >= 0) & (u <= 1)
    qv = np.cross(tv, e1, axis=0)
    v = np.sum(dN * qv, axis=0) * inv
    ok &= (v >= 0) & (u + v <= 1)
    t = np.sum(e2 * qv, axis=0) * inv
    ok &= (t > traversal.TRI_EPSILON) & (t > traversal.MIN_T)
    facing = np.sum(np.cross(e1, e2, axis=0) * dN, axis=0)
    ok &= facing < 0.0
    t = np.where(ok, t, 1e30)
    t.sort(axis=1)
    ref1, ref2 = t[:, 0], t[:, 1]

    g1, g2 = np.asarray(sw.outer_fwd), np.asarray(sw.outer_fwd2)
    np.testing.assert_array_equal(g1 < 1e30, ref1 < 1e30)
    np.testing.assert_array_equal(g2 < 1e30, ref2 < 1e30)
    h1, h2 = ref1 < 1e30, ref2 < 1e30
    np.testing.assert_allclose(g1[h1], ref1[h1], rtol=2e-6)
    np.testing.assert_allclose(g2[h2], ref2[h2], rtol=2e-6)
    assert h2.sum() > 50


def test_camera_march_fast_path_matches_reference_path():
    """The camera fast path (entry + iteration 1 from ONE sweep) must agree
    with the reference-shaped path: explicit entry trace + per-iteration
    sweeps, provided via the `entry=` hook."""
    from neural_renderer_tpu.render.neural_march import _shell_entry_camera
    from neural_renderer_tpu.render.params import RenderParams
    from neural_renderer_tpu.scene.materials import Material

    outer = outward_sphere(12, 24, 1.2).to_arrays()
    inner = outward_sphere(12, 24, 0.8).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = nbvh.init_params(jax.random.PRNGKey(2), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = RenderParams.make(
        width=8, height=8, samples_per_pixel=1, max_bounces=1,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=0.9, material=Material.default(),
        scene_scale=2.0, outer_shell_min=omin,
        outer_shell_inv_extent=1.0 / (omax - omin))

    n = 2048
    o, d = _random_rays(n, seed=13, spread=4.0)

    fast = trace_neural_segments(ctx, params, o, d, camera_rays=True,
                                 compute_dtype=jnp.float32, compaction=False)
    ref = trace_neural_segments(
        ctx, params, o, d, camera_rays=True, compute_dtype=jnp.float32,
        compaction=False, entry=_shell_entry_camera(outer, o, d))

    np.testing.assert_array_equal(np.asarray(fast.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(fast.distance),
                               np.asarray(ref.distance), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fast.position),
                               np.asarray(ref.position), rtol=2e-5, atol=2e-5)
    assert int(np.asarray(fast.hit).sum()) > 100


def test_sweep_empty_inner():
    outer = outward_sphere(8, 16, 1.0).to_arrays()
    from neural_renderer_tpu.scene.mesh import Mesh
    inner = Mesh().to_arrays()
    o, d = _random_rays(512)
    sw = traversal.sweep_shells(outer, inner, o, d)
    assert np.all(np.asarray(sw.inner_fwd) == 1e30)
    assert np.all(np.asarray(sw.inner_bwd) == 1e30)
    r = traversal.trace_mesh_brute(outer, o, d, traversal.FORWARD_ONLY)
    ref = np.where(np.asarray(r.hit), np.asarray(r.t), 1e30)
    g = np.asarray(sw.outer_fwd)
    np.testing.assert_array_equal(g < 1e30, ref < 1e30)
    h = ref < 1e30
    np.testing.assert_allclose(g[h], ref[h], rtol=2e-6)


def test_fused_bounce_stage_matches_unfused():
    """bounce_shell_entry_and_early_term == check_bounce_early_termination
    followed by the march's own _shell_entry_from_rays, bit-exactly."""
    from neural_renderer_tpu.render.neural_march import _shell_entry_from_rays

    outer = outward_sphere(12, 24, 1.2).to_arrays()
    inner = outward_sphere(12, 24, 0.8).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = nbvh.init_params(jax.random.PRNGKey(2), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)

    n = 2048
    o, d = _random_rays(n, seed=3)
    rng = np.random.default_rng(4)
    pdf = jnp.asarray(np.where(rng.random(n) < 0.8, rng.random(n) + 0.1, 0.0),
                      jnp.float32)
    dist = jnp.asarray(np.where(rng.random(n) < 0.9, rng.random(n) + 0.05, 0.0),
                       jnp.float32)
    active = jnp.asarray(rng.random(n) < 0.7)
    rays = pt.BounceRays(origin=o, direction=d, pdf=pdf,
                         brdf_weight=jnp.zeros((3, n), jnp.float32),
                         distance=dist)

    active_ref = check_bounce_early_termination(outer, inner, None, rays,
                                                active)
    entry_ref = _shell_entry_from_rays(outer, o, d, active_ref, pdf)

    active_f, entry_f = bounce_shell_entry_and_early_term(ctx, rays, active)

    np.testing.assert_array_equal(np.asarray(active_ref), np.asarray(active_f))
    np.testing.assert_array_equal(np.asarray(entry_ref[1]),
                                  np.asarray(entry_f[1]))  # hit mask
    np.testing.assert_allclose(np.asarray(entry_ref[0]),
                               np.asarray(entry_f[0]), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(entry_ref[2]),
                               np.asarray(entry_f[2]), rtol=2e-6)
    assert int(np.asarray(active_f).sum()) > 100
    assert int(np.asarray(entry_f[1]).sum()) > 100


def test_march_with_precomputed_entry_matches():
    """trace_neural_segments(entry=...) == the internal entry path."""
    from neural_renderer_tpu.render.neural_march import _shell_entry_from_rays
    from neural_renderer_tpu.render.params import RenderParams
    from neural_renderer_tpu.scene.materials import Material

    outer = outward_sphere(12, 24, 1.2).to_arrays()
    inner = outward_sphere(12, 24, 0.8).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = nbvh.init_params(jax.random.PRNGKey(2), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = RenderParams.make(
        width=8, height=8, samples_per_pixel=1, max_bounces=1,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=0.9, material=Material.default(),
        scene_scale=2.0, outer_shell_min=omin,
        outer_shell_inv_extent=1.0 / (omax - omin))

    n = 1024
    o, d = _random_rays(n, seed=7)
    pdf = jnp.ones((n,), jnp.float32)
    active = jnp.ones((n,), bool)

    a = trace_neural_segments(ctx, params, o, d, ray_active=active, pdfs=pdf,
                              camera_rays=False, compute_dtype=jnp.float32,
                              compaction=False)
    entry = _shell_entry_from_rays(outer, o, d, active, pdf)
    b = trace_neural_segments(ctx, params, o, d, camera_rays=False,
                              compute_dtype=jnp.float32, compaction=False,
                              entry=entry)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.position),
                                  np.asarray(b.position))
    np.testing.assert_array_equal(np.asarray(a.distance),
                                  np.asarray(b.distance))
    assert int(np.asarray(a.hit).sum()) > 50


def test_entry_retry_derive_matches_trace():
    """The default retry="derive" (no re-entry trace) must equal the
    reference-shaped retry="trace" path bit-exactly: a ray whose FORWARD
    trace from its origin missed cannot gain a forward crossing from a
    shifted origin (crossings along the same ray are a fixed set; the sweep
    already reported the closest one). Mixed inside/outside-start rays
    exercise both branches, including bounce-like origins between the
    shells."""
    from neural_renderer_tpu.render.neural_march import _shell_entry_from_rays

    outer = outward_sphere(12, 24, 1.2).to_arrays()
    inner = outward_sphere(12, 24, 0.8).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = nbvh.init_params(jax.random.PRNGKey(2), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)

    n = 4096
    rng = np.random.default_rng(11)
    # Half the origins between the shells (bounce-ray geometry: inside the
    # outer mesh, where the traced retry used to run), half outside.
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    r = np.where(rng.random(n) < 0.5, rng.uniform(0.85, 1.15, n),
                 rng.uniform(1.5, 3.0, n))
    o = jnp.asarray((u * r[:, None]).T, jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.T, jnp.float32)
    pdf = jnp.asarray(np.where(rng.random(n) < 0.9, rng.random(n) + 0.1, 0.0),
                      jnp.float32)
    dist = jnp.asarray(rng.random(n) + 0.05, jnp.float32)
    active = jnp.asarray(rng.random(n) < 0.85)
    rays = pt.BounceRays(origin=o, direction=d, pdf=pdf,
                         brdf_weight=jnp.zeros((3, n), jnp.float32),
                         distance=dist)

    for fn, args in (
            (bounce_shell_entry_and_early_term, (ctx, rays, active)),
            (_shell_entry_from_rays, (outer, o, d, active, pdf))):
        got = jax.jit(lambda *a, f=fn: f(*a, retry="derive"))(*args)
        ref = jax.jit(lambda *a, f=fn: f(*a, retry="trace"))(*args)
        for g, r_ in zip(jax.tree_util.tree_leaves(got),
                         jax.tree_util.tree_leaves(ref)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r_))
    # The scenario must actually contain inside-start rays (the branch the
    # derivation removes).
    sw = traversal.sweep_shells(outer, inner, o, d)
    inside_start = np.asarray((sw.outer_fwd >= 1e30) & (sw.outer_bwd < 1e30))
    assert inside_start.sum() > 500

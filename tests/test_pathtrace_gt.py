"""Ground-truth path tracer pipeline tests (evaluate GT branch semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_renderer_tpu.render.params import RenderParams
from neural_renderer_tpu.render.pathtrace import (
    render_gt_frame, render_gt_lambert)
from neural_renderer_tpu.scene.envmap import EnvironmentMap
from neural_renderer_tpu.scene.materials import Material, MaterialParamVec3
from neural_renderer_tpu.scene.mesh_loader import generate_uv_sphere


def _outward_sphere(stacks=12, slices=24, radius=1.0):
    """UV sphere with outward-facing winding.

    The reference fixture's winding (mesh_loader.cpp:752-762) makes geometric
    normals point INWARD, so FORWARD_ONLY primary rays see the far-side
    interior — faithful but a degenerate path-tracing scene. Tests flip the
    winding to get a conventional opaque sphere.
    """
    mesh = generate_uv_sphere(stacks, slices, radius)
    mesh.indices = mesh.indices[:, [0, 2, 1]].copy()
    mesh.mark_dirty()
    return mesh


def _setup(width=32, height=24, spp=2, bounces=2, material=None):
    mesh = _outward_sphere().to_arrays()
    env = EnvironmentMap().to_arrays()  # procedural sky
    mat = material or Material.default()
    params = RenderParams.make(
        width=width, height=height, samples_per_pixel=spp, max_bounces=bounces,
        cam_pos=[0.0, 0.0, 3.0], cam_forward=[0.0, 0.0, -1.0],
        cam_right=[1.0, 0.0, 0.0], cam_up=[0.0, 1.0, 0.0], fov_y=1.0,
        material=mat, scene_scale=2.0)
    return mesh, env, params


def test_lambert_render():
    mesh, env, params = _setup()
    img = np.asarray(render_gt_lambert(mesh, env, params))
    assert img.shape == (24, 32, 3)
    assert img.dtype == np.uint8
    # Center pixel looks at the sphere head-on: N·V ≈ 1, default albedo 0.8.
    center = img[12, 16].astype(float) / 255.0
    expected = 0.8 ** (1 / 2.4) * 1.055 - 0.055  # srgb(0.8) approx
    assert abs(center[0] - expected) < 0.08
    # Corner pixel misses: sky gradient (blueish).
    corner = img[0, 0]
    assert corner[2] >= corner[0]


def test_gt_frame_basic():
    mesh, env, params = _setup()
    accum = jnp.zeros((3, params.pixel_count), jnp.float32)
    img, accum2 = jax.jit(render_gt_frame)(mesh, env, params, accum)
    img = np.asarray(img)
    assert img.shape == (24, 32, 3)
    a2 = np.asarray(accum2)
    assert np.isfinite(a2).all()
    assert a2.max() > 0.0
    # Sphere center is lit (diffuse bounce picks up sky energy).
    assert img[12, 16].astype(int).sum() > 30


def test_gt_accumulation_batches_match_single_call():
    """Two 2-spp batches == one 4-spp call (sampleOffset stream semantics,
    evaluate.cu:253-264)."""
    mesh, env, p2 = _setup(spp=2)
    accum = jnp.zeros((3, p2.pixel_count), jnp.float32)
    img_a, accum = render_gt_frame(mesh, env, p2, accum)
    p2b = jax.tree_util.tree_map(lambda x: x, p2)
    import dataclasses
    p2b = dataclasses.replace(p2, sample_offset=jnp.uint32(2))
    img_b, accum = render_gt_frame(mesh, env, p2b, accum)

    _, _, p4 = _setup(spp=4)
    accum4 = jnp.zeros((3, p4.pixel_count), jnp.float32)
    img_c, accum4 = render_gt_frame(mesh, env, p4, accum4)

    np.testing.assert_allclose(np.asarray(accum), np.asarray(accum4),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_c))


def test_gt_deterministic():
    mesh, env, params = _setup()
    accum = jnp.zeros((3, params.pixel_count), jnp.float32)
    img1, _ = render_gt_frame(mesh, env, params, accum)
    img2, _ = render_gt_frame(mesh, env, params, accum)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_gt_emissive_free_energy_conservation():
    """With a pure white sky (radiance 1) and a grey diffuse sphere, pixel
    radiance must stay within [0, 1] on average (no energy creation)."""
    mesh = _outward_sphere().to_arrays()
    em = EnvironmentMap()
    em.pixels = np.ones((4, 8, 3), dtype=np.float32)
    env = em.to_arrays()
    params = RenderParams.make(
        width=24, height=24, samples_per_pixel=8, max_bounces=3,
        cam_pos=[0.0, 0.0, 3.0], cam_forward=[0.0, 0.0, -1.0],
        cam_right=[1.0, 0.0, 0.0], cam_up=[0.0, 1.0, 0.0], fov_y=1.0,
        material=Material.default(), scene_scale=2.0)
    accum = jnp.zeros((3, params.pixel_count), jnp.float32)
    _, accum = render_gt_frame(mesh, env, params, accum)
    mean_rad = np.asarray(accum) / params.samples_per_pixel
    assert np.isfinite(mean_rad).all()
    assert mean_rad.mean() <= 1.05
    assert mean_rad.mean() > 0.3

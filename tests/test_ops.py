"""JAX ops tests: RNG bit-exactness, traversal vs brute force, env sampling,
sRGB, Disney BRDF self-consistency.

All device vectors are channel-major [3, N]; tests build numpy [N, 3] and
transpose at the boundary.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_renderer_tpu.ops import brdf, envlight, rng as rng_ops, srgb, traversal
from neural_renderer_tpu.ops.camera import generate_primary_rays
from neural_renderer_tpu.ops.intersect import compute_hit_data, intersect_triangle
from neural_renderer_tpu.scene.envmap import EnvironmentMap
from neural_renderer_tpu.scene.mesh_loader import generate_uv_sphere


def cm(a):
    """numpy [N, 3] -> jnp [3, N]."""
    return jnp.asarray(np.asarray(a, np.float32).T)


# ---------------------------------------------------------------------------
# RNG (bit-exact vs a straight numpy port of mesh_traversal.cuh:17-34)
# ---------------------------------------------------------------------------

def np_wang_hash(x):
    x = np.uint32(x)
    x = np.uint32((x ^ np.uint32(61)) ^ (x >> np.uint32(16)))
    with np.errstate(over="ignore"):
        x = np.uint32(x * np.uint32(9))
        x = np.uint32(x ^ (x >> np.uint32(4)))
        x = np.uint32(x * np.uint32(0x27D4EB2D))
        x = np.uint32(x ^ (x >> np.uint32(15)))
    return x


def test_wang_hash_bit_exact():
    xs = np.array([0, 1, 2, 61, 12345, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(rng_ops.wang_hash(jnp.asarray(xs)))
    want = np.array([np_wang_hash(x) for x in xs], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_init_rng_and_rand01():
    pixel = jnp.asarray([7, 123456], dtype=jnp.uint32)
    state = rng_ops.init_rng(pixel, 8, 3)
    with np.errstate(over="ignore"):
        seed = (np.uint32(7) * np.uint32(9781)
                + np.uint32(8 + 3 + 1) * np.uint32(6271))
    assert int(state[0]) == int(np_wang_hash(seed))

    state2, val = rng_ops.rand01(state)
    want_state = np_wang_hash(np.uint32(int(state[0])))
    assert int(state2[0]) == int(want_state)
    want_val = (want_state & np.uint32(0xFFFFFF)) * (1.0 / 16777216.0)
    assert float(val[0]) == pytest.approx(float(want_val), abs=1e-9)
    assert 0.0 <= float(val[0]) < 1.0


# ---------------------------------------------------------------------------
# Primary rays
# ---------------------------------------------------------------------------

def test_primary_rays_center_points_forward():
    w, h = 64, 64
    px = jnp.asarray([w // 2])
    py = jnp.asarray([h // 2])
    state = rng_ops.init_rng(jnp.asarray([0], dtype=jnp.uint32), 0, 0)
    fwd = jnp.array([0.0, 0.0, -1.0])
    right = jnp.array([1.0, 0.0, 0.0])
    up = jnp.array([0.0, 1.0, 0.0])
    pos = jnp.array([1.0, 2.0, 3.0])
    _, origins, dirs = generate_primary_rays(
        px, py, state, pos, fwd, right, up, jnp.float32(1.0), w, h)
    assert origins.shape == (3, 1) and dirs.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(origins[:, 0]), [1, 2, 3], atol=1e-6)
    assert float(jnp.sum(dirs[:, 0] * fwd)) > 0.99
    np.testing.assert_allclose(float(jnp.linalg.norm(dirs[:, 0])), 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# Triangle intersection + traversal
# ---------------------------------------------------------------------------

def test_intersect_triangle_basic():
    o = cm([[0.0, 0.0, -1.0]])
    d = cm([[0.0, 0.0, 1.0]])
    v0 = cm([[-1.0, -1.0, 0.0]])
    v1 = cm([[1.0, -1.0, 0.0]])
    v2 = cm([[0.0, 1.0, 0.0]])
    t, u, v, ok = intersect_triangle(o, d, v0, v1, v2)
    assert bool(ok[0])
    assert float(t[0]) == pytest.approx(1.0, abs=1e-6)
    # Miss
    o2 = cm([[5.0, 5.0, -1.0]])
    t2, _, _, ok2 = intersect_triangle(o2, d, v0, v1, v2)
    assert not bool(ok2[0])
    assert float(t2[0]) >= 1e29


def _random_rays(rng, n, r_origin=3.0, r_target=0.4):
    origins = rng.normal(size=(n, 3))
    origins = origins / np.linalg.norm(origins, axis=1, keepdims=True) * r_origin
    targets = rng.normal(size=(n, 3)) * r_target
    d = targets - origins
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return origins.astype(np.float32), d.astype(np.float32)


@pytest.mark.parametrize("mode", [traversal.ANY, traversal.FORWARD_ONLY,
                                  traversal.BACKWARD_ONLY])
def test_traversal_matches_bruteforce(rng, mode):
    mesh = generate_uv_sphere(12, 24, 1.0).to_arrays()
    origins, dirs = _random_rays(rng, 128)
    res_bvh = traversal.trace_mesh(mesh, cm(origins), cm(dirs), mode)
    res_ref = traversal.trace_mesh_brute(mesh, cm(origins), cm(dirs), mode)
    np.testing.assert_array_equal(np.asarray(res_bvh.hit), np.asarray(res_ref.hit))
    hits = np.asarray(res_ref.hit)
    np.testing.assert_allclose(np.asarray(res_bvh.t)[hits],
                               np.asarray(res_ref.t)[hits], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(res_bvh.tri)[hits],
                                  np.asarray(res_ref.tri)[hits])


def test_traversal_rays_from_inside(rng):
    """Rays starting inside the sphere must hit (ANY) for every direction."""
    mesh = generate_uv_sphere(12, 24, 1.0).to_arrays()
    dirs = rng.normal(size=(64, 3))
    dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = np.zeros((64, 3), dtype=np.float32)
    res = traversal.trace_mesh(mesh, cm(origins), cm(dirs), traversal.ANY)
    assert np.asarray(res.hit).all()
    np.testing.assert_allclose(np.asarray(res.t), 1.0, atol=2e-2)


def test_traversal_active_mask(rng):
    mesh = generate_uv_sphere(8, 16, 1.0).to_arrays()
    origins, dirs = _random_rays(rng, 32)
    active = jnp.asarray(np.arange(32) % 2 == 0)
    res = traversal.trace_mesh(mesh, cm(origins), cm(dirs), traversal.ANY,
                               active=active)
    assert not np.asarray(res.hit)[1::2].any()


def test_compute_hit_data_sphere(rng):
    host = generate_uv_sphere(16, 32, 1.0)
    mesh = host.to_arrays()
    origins, dirs = _random_rays(rng, 64)
    res = traversal.trace_mesh(mesh, cm(origins), cm(dirs), traversal.ANY)
    hit_data = compute_hit_data(mesh, cm(origins), cm(dirs),
                                res.tri, res.u, res.v, res.t)
    hits = np.asarray(res.hit)
    pos = np.asarray(hit_data.position).T[hits]
    radii = np.linalg.norm(pos, axis=1)
    assert (np.abs(radii - 1.0) < 0.05).all()
    sn = np.asarray(hit_data.shading_normal).T[hits]
    dots = np.sum(sn * pos / radii[:, None], axis=1)
    assert dots.min() > 0.98


# ---------------------------------------------------------------------------
# Environment sampling
# ---------------------------------------------------------------------------

def test_environment_fallback_sky():
    env = EnvironmentMap().to_arrays()
    dirs = cm([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    colors = np.asarray(envlight.sample_environment(env, dirs)).T
    np.testing.assert_allclose(colors[0], [0.5, 0.7, 1.0], atol=1e-6)
    np.testing.assert_allclose(colors[1], [1.0, 1.0, 1.0], atol=1e-6)


def test_environment_lookup_and_rotation():
    em = EnvironmentMap()
    px = np.zeros((2, 4, 3), dtype=np.float32)
    px[:, :, 0] = np.arange(4)[None, :]
    px[:, :, 1] = np.arange(2)[:, None]
    em.pixels = px
    env = em.to_arrays()

    d = cm([[0.0, 0.0, -1.0]])  # u = atan2(0, 1)/(2pi)+0.5 = 0.5
    c = np.asarray(envlight.sample_environment(env, d))[:, 0]
    assert c[0] == pytest.approx(1.5, abs=1e-5)
    assert c[1] == pytest.approx(0.5, abs=1e-5)

    em.set_rotation(90.0)
    env_rot = em.to_arrays()
    c_rot = np.asarray(envlight.sample_environment(env_rot, d))[:, 0]
    assert abs(c_rot[0] - c[0]) > 0.1


def test_environment_clamp():
    em = EnvironmentMap()
    em.pixels = np.full((2, 8, 3), 1e6, dtype=np.float32)
    env = em.to_arrays()
    d = cm([[0.0, 0.0, 1.0]])
    c = np.asarray(envlight.sample_environment(env, d))
    np.testing.assert_allclose(c, 100.0)
    c2 = np.asarray(envlight.sample_environment_clamped(env, d, jnp.float32(10.0)))
    np.testing.assert_allclose(c2, 10.0)


# ---------------------------------------------------------------------------
# sRGB
# ---------------------------------------------------------------------------

def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    y = srgb.srgb_to_linear(srgb.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_srgb_reference_points():
    assert float(srgb.linear_to_srgb(jnp.float32(0.0))) == 0.0
    assert float(srgb.linear_to_srgb(jnp.float32(1.0))) == pytest.approx(1.0, abs=1e-6)
    assert float(srgb.linear_to_srgb(jnp.float32(0.0031308))) == pytest.approx(
        12.92 * 0.0031308, abs=1e-6)
    assert float(srgb.linear_to_srgb(jnp.float32(5.0))) == 1.0  # clamped


# ---------------------------------------------------------------------------
# Disney BRDF
# ---------------------------------------------------------------------------

def _material(n, **over):
    base = dict(
        base_color=jnp.full((3, n), 0.8),
        metallic=jnp.zeros(n), roughness=jnp.full(n, 0.5),
        specular=jnp.full(n, 0.5), specular_tint=jnp.zeros(n),
        anisotropy=jnp.zeros(n), sheen=jnp.zeros(n), sheen_tint=jnp.zeros(n),
        clearcoat=jnp.zeros(n), clearcoat_gloss=jnp.full(n, 1.0),
        ior=jnp.full(n, 1.5), specular_transmission=jnp.zeros(n))
    for k, val in over.items():
        if k == "base_color":
            base[k] = jnp.broadcast_to(jnp.asarray(val)[:, None], (3, n))
        else:
            base[k] = jnp.full(n, val)
    return brdf.BrdfMaterial(**base)


def test_diffuse_brdf_value():
    """Pure rough diffuse at normal incidence ≈ base_color/pi * retro terms."""
    n = cm([[0.0, 0.0, 1.0]])
    wo = cm([[0.0, 0.0, 1.0]])
    wi = cm([[0.0, 0.0, 1.0]])
    mat = _material(1, roughness=1.0, specular=0.0)
    t, b = brdf.build_tangent_space(n)
    f = np.asarray(brdf.disney_eval(mat, n, wo, wi, t, b))[:, 0]
    assert f[0] == pytest.approx(0.8 / np.pi, rel=1e-3)


def test_eval_opposite_hemisphere_no_transmission_is_zero():
    n = cm([[0.0, 0.0, 1.0]])
    wo = cm([[0.0, 0.0, 1.0]])
    wi = cm([[0.0, 0.0, -1.0]])
    mat = _material(1)
    t, b = brdf.build_tangent_space(n)
    f = np.asarray(brdf.disney_eval(mat, n, wo, wi, t, b))
    np.testing.assert_allclose(f, 0.0)


def test_pdf_integrates_to_one(rng):
    """MC integral of the 3-component mixture PDF over the sphere ≈ 1."""
    n_samples = 100_000
    wo_v = np.array([0.3, 0.1, 0.95])
    wo_v = wo_v / np.linalg.norm(wo_v)
    wo = jnp.broadcast_to(jnp.asarray(wo_v, jnp.float32)[:, None], (3, n_samples))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32)[:, None],
                           (3, n_samples))
    dirs = rng.normal(size=(n_samples, 3))
    dirs = cm(dirs / np.linalg.norm(dirs, axis=1, keepdims=True))
    mat = _material(n_samples, roughness=0.6, clearcoat=1.0, clearcoat_gloss=0.5)
    t, b = brdf.build_tangent_space(nrm)
    pdf = np.asarray(brdf.disney_pdf_3component(mat, nrm, wo, dirs, t, b))
    pdf = np.nan_to_num(pdf, nan=0.0, posinf=0.0, neginf=0.0)
    integral = pdf.mean() * 4.0 * np.pi
    assert integral == pytest.approx(1.0, abs=0.1)


def test_sample_3component_consistency(rng):
    """Sampled directions have positive mixture pdf and lie in the right
    hemisphere for reflective lobes; invalid samples are flagged pdf=0."""
    n_samples = 4096
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32)[:, None],
                           (3, n_samples))
    wo_single = np.array([0.4, -0.2, 0.89])
    wo_single = wo_single / np.linalg.norm(wo_single)
    wo = jnp.broadcast_to(jnp.asarray(wo_single, jnp.float32)[:, None],
                          (3, n_samples))
    u = rng.uniform(size=(3, n_samples)).astype(np.float32)
    mat = _material(n_samples, roughness=0.4, metallic=0.3, clearcoat=0.5)
    t, b = brdf.build_tangent_space(nrm)
    wi, pdf = brdf.disney_sample_3component(
        mat, nrm, wo, t, b, jnp.asarray(u[0]), jnp.asarray(u[1]), jnp.asarray(u[2]))
    wi = np.asarray(wi).T
    pdf = np.asarray(pdf)
    valid = pdf > 0
    assert valid.mean() > 0.7
    lens = np.linalg.norm(wi[valid], axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    assert (wi[valid][:, 2] > 0).all()
    f = np.asarray(brdf.disney_eval(mat, nrm, wo, cm(wi), t, b)).T
    w = f[valid] * np.abs(wi[valid][:, 2:3]) / pdf[valid][:, None]
    assert np.isfinite(w).all()


def test_sample_full_transmission_invalid():
    nrm = cm([[0.0, 0.0, 1.0]])
    wo = cm([[0.0, 0.0, 1.0]])
    mat = _material(1, specular_transmission=1.0)
    t, b = brdf.build_tangent_space(nrm)
    _, pdf = brdf.disney_sample_3component(
        mat, nrm, wo, t, b, jnp.asarray([0.5]), jnp.asarray([0.5]), jnp.asarray([0.1]))
    assert float(pdf[0]) == 0.0


def test_build_tangent_space_orthonormal(rng):
    n = rng.normal(size=(256, 3))
    n = cm(n / np.linalg.norm(n, axis=1, keepdims=True))
    t, b = brdf.build_tangent_space(n)
    tn = np.asarray(t).T
    bn = np.asarray(b).T
    nn = np.asarray(n).T
    np.testing.assert_allclose(np.linalg.norm(tn, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(bn, axis=1), 1.0, atol=1e-5)
    assert np.abs(np.sum(tn * nn, axis=1)).max() < 1e-5
    assert np.abs(np.sum(bn * nn, axis=1)).max() < 1e-5
    assert np.abs(np.sum(tn * bn, axis=1)).max() < 1e-5

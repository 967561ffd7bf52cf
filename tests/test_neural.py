"""Neural stack tests: encodings, network, checkpoint blob IO, shell march."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.models.encoding import (
    HashGridConfig, hashgrid_encode, init_hashgrid, sh_encode)
from neural_renderer_tpu.render.neural_march import (
    NeuralContext, trace_neural_segments)
from neural_renderer_tpu.render.params import RenderParams
from neural_renderer_tpu.scene.materials import Material
from neural_renderer_tpu.scene.mesh import Mesh

from util import crafted_net_params, outward_sphere


# ---------------------------------------------------------------------------
# Hash grid
# ---------------------------------------------------------------------------

def test_hashgrid_level_geometry():
    cfg = HashGridConfig()  # 8 levels, base 16, scale 2.0, 2^14 entries
    # Level 0: scale 15, res 16, dense 4096.
    assert cfg.level_scale(0) == pytest.approx(15.0)
    assert cfg.level_resolution(0) == 16
    assert cfg.level_is_dense(0)
    assert cfg.level_entries(0) == 4096
    # Level 1: scale 31, res 32 -> 32768 > 16384 -> hashed.
    assert not cfg.level_is_dense(1)
    assert cfg.level_entries(1) == 16384
    # Totals match the reference checkpoint sizing
    # (hgNParams = 4096*4 + 7*16384*4 = 475136).
    assert cfg.n_params == 475136


def test_nbvh_param_counts():
    cfg = nbvh.NbvhConfig()
    assert cfg.input_dims == 12
    assert cfg.encoded_dims == 112  # 3*32 + 16
    assert cfg.mlp_n_params == 65536
    assert cfg.hg_n_params == 475136
    # Flat blob = mlp + ONE hash grid (tiled to 3 slots on load).
    assert (cfg.mlp_n_params + cfg.hg_n_params) * 2 == 1081344  # bytes fp16


def test_hashgrid_interpolation_continuity(rng):
    """Encoding must be continuous and exactly reproduce table values at
    integer grid corners of the dense level."""
    cfg = HashGridConfig(n_levels=1, base_resolution=16)
    tables = init_hashgrid(jax.random.PRNGKey(1), cfg)
    # At x such that p = x*scale + 0.5 is integer k: x = (k - 0.5)/15.
    k = 7
    x = jnp.full((3, 1), (k - 0.5) / 15.0, jnp.float32)
    feat = hashgrid_encode(tables, x, cfg)
    want = np.asarray(tables[0][k + 16 * k + 256 * k])
    np.testing.assert_allclose(np.asarray(feat[0]), want, rtol=1e-4)

    # Continuity: small input steps -> small feature steps.
    xs = jnp.linspace(0.2, 0.21, 50)[None, :].repeat(3, axis=0)
    feats = np.asarray(hashgrid_encode(tables, xs, cfg))
    deltas = np.abs(np.diff(feats, axis=0)).max()
    assert deltas < 2e-5


def test_hashgrid_encode_shapes(rng):
    cfg = HashGridConfig()
    tables = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(size=(3, 17)), jnp.float32)
    out = hashgrid_encode(tables, x, cfg)
    assert out.shape == (17, 32)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# Spherical harmonics
# ---------------------------------------------------------------------------

def test_sh_constant_and_linear_terms():
    d01 = jnp.asarray([[0.5], [0.5], [1.0]])  # dir = (0, 0, 1)
    sh = np.asarray(sh_encode(d01))[0]
    assert sh[0] == pytest.approx(0.28209479, abs=1e-6)
    assert sh[1] == pytest.approx(0.0, abs=1e-7)          # -c*y, y=0
    assert sh[2] == pytest.approx(0.48860251, abs=1e-6)   # c*z, z=1
    assert sh[3] == pytest.approx(0.0, abs=1e-7)          # -c*x, x=0
    assert sh.shape == (16,)


def test_sh_orthogonality(rng):
    """Real SH basis functions are orthonormal over the sphere:
    4*pi*E[Y_i Y_j] = delta_ij under uniform direction sampling."""
    d = rng.normal(size=(60_000, 3))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    d01 = jnp.asarray(((d + 1.0) * 0.5).T, jnp.float32)
    y = np.asarray(sh_encode(d01))
    gram = 4.0 * np.pi * (y.T @ y) / y.shape[0]
    np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


# ---------------------------------------------------------------------------
# Network forward + blob IO
# ---------------------------------------------------------------------------

def test_network_forward_shapes():
    cfg = nbvh.NbvhConfig()
    params = nbvh.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(12, 33)), jnp.float32)
    out = nbvh.apply(params, x, cfg, compute_dtype=jnp.float32)
    assert out.shape == (16, 33)
    assert np.isfinite(np.asarray(out)).all()


def test_chunked_apply_matches_unchunked(monkeypatch):
    """Batches above ENC_CHUNK are lax.map'd in chunks (HBM temp cap for
    spp>1 1080p evaluate batches); chunking must not change the math."""
    cfg = nbvh.NbvhConfig()
    params = nbvh.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(12, 100)),
                    jnp.float32)
    ref = np.asarray(nbvh.apply(params, x, cfg, compute_dtype=jnp.float32))
    monkeypatch.setattr(nbvh, "ENC_CHUNK", 32)  # 100 -> 4 chunks, padded tail
    chunked = np.asarray(nbvh.apply(params, x, cfg,
                                    compute_dtype=jnp.float32))
    # Not bit-exact: the chunked matmuls tile a different batch shape,
    # shifting FMA contraction order by ~1-2 ulp on a handful of elements
    # (both on the MXU and in the CPU backend's different fusion choices).
    np.testing.assert_allclose(ref, chunked, rtol=1e-6, atol=5e-7)


def test_bf16_close_to_f32():
    cfg = nbvh.NbvhConfig()
    params = nbvh.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(12, 64)), jnp.float32)
    out32 = np.asarray(nbvh.apply(params, x, cfg, compute_dtype=jnp.float32))
    out16 = np.asarray(nbvh.apply(params, x, cfg, compute_dtype=jnp.bfloat16))
    scale = np.abs(out32).max() + 1e-6
    assert np.abs(out32 - out16).max() / scale < 0.05


def test_flat_blob_roundtrip(tmp_path):
    cfg = nbvh.NbvhConfig()
    params = nbvh.init_params(jax.random.PRNGKey(42), cfg)
    path = str(tmp_path / "weights.bin")
    nbvh.save_flat_blob(path, params, cfg, swap_param_order=True)
    import os
    assert os.path.getsize(path) == 1081344

    loaded = nbvh.load_flat_blob(path, cfg, swap_param_order=True)
    # MLP roundtrips (through fp16).
    for a, b in zip(params["mlp"], loaded["mlp"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    # The single grid block is shared across all slots on load.
    assert len(loaded["grids"]) == 1
    for a, b in zip(params["grids"][0], loaded["grids"][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_shared_grid_export_is_lossless(tmp_path):
    """The end-to-end guarantee behind training: with the default shared
    grid, exporting to the reference blob and loading back must reproduce
    the network function (up to fp16 storage), not just slot 0."""
    cfg = nbvh.NbvhConfig()
    params = nbvh.init_params(jax.random.PRNGKey(11), cfg)
    assert len(params["grids"]) == 1
    path = str(tmp_path / "w.bin")
    nbvh.save_flat_blob(path, params, cfg)
    loaded = nbvh.load_flat_blob(path, cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(12, 32)), jnp.float32)
    a = np.asarray(nbvh.apply(params, x, cfg, compute_dtype=jnp.float32))
    b = np.asarray(nbvh.apply(loaded, x, cfg, compute_dtype=jnp.float32))
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_flat_blob_order_flag(tmp_path):
    cfg = nbvh.NbvhConfig()
    params = nbvh.init_params(jax.random.PRNGKey(7), cfg)
    path = str(tmp_path / "w.bin")
    nbvh.save_flat_blob(path, params, cfg, swap_param_order=False)
    loaded = nbvh.load_flat_blob(path, cfg, swap_param_order=False)
    np.testing.assert_allclose(np.asarray(params["mlp"][0]),
                               np.asarray(loaded["mlp"][0]), atol=2e-3)


def test_flat_blob_size_mismatch(tmp_path):
    cfg = nbvh.NbvhConfig()
    path = str(tmp_path / "bad.bin")
    np.zeros(10, np.float16).tofile(path)
    with pytest.raises(ValueError, match="size mismatch"):
        nbvh.load_flat_blob(path, cfg)


def test_crafted_net_constant_output():
    cfg = nbvh.NbvhConfig()
    params = crafted_net_params(cfg, presence=-3.0, distance=0.7)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(12, 8)), jnp.float32)
    out = np.asarray(nbvh.apply(params, x, cfg, compute_dtype=jnp.float32))
    np.testing.assert_allclose(out[0], -3.0, atol=1e-4)
    np.testing.assert_allclose(out[1], 0.7, atol=1e-4)


# ---------------------------------------------------------------------------
# Shell march
# ---------------------------------------------------------------------------

def _march_setup(inner_present=True):
    outer = outward_sphere(10, 20, 1.2).to_arrays()
    inner = (outward_sphere(10, 20, 0.8) if inner_present else Mesh()).to_arrays()
    cfg = nbvh.NbvhConfig()
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = RenderParams.make(
        width=4, height=4, samples_per_pixel=1, max_bounces=1,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0],
        cam_right=[1, 0, 0.0], cam_up=[0, 1, 0.0], fov_y=0.6,
        material=Material.default(), scene_scale=2.0,
        outer_shell_min=omin, outer_shell_inv_extent=1.0 / (omax - omin))
    return outer, inner, cfg, params


def _march(ctx, params, origins, dirs, **kw):
    fn = jax.jit(lambda c, p, o, d: trace_neural_segments(
        c, p, o, d, compute_dtype=jnp.float32, **kw))
    return fn(ctx, params, jnp.asarray(np.asarray(origins, np.float32).T),
              jnp.asarray(np.asarray(dirs, np.float32).T))


def test_march_always_hit_net():
    """presence >= 0 everywhere -> hit at shell entry + predicted distance."""
    outer, inner, cfg, params = _march_setup()
    net = crafted_net_params(cfg, presence=1.0, distance=0.15)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    origins = np.broadcast_to([0.0, 0.0, 3.0], (2, 3))
    dirs = np.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    hits = _march(ctx, params, origins, dirs)
    assert bool(hits.hit[0])          # through the shell
    assert not bool(hits.hit[1])      # away from the shell
    # Entry at z≈1.2, hit at entry + 0.15 along -z.
    assert float(hits.position[2, 0]) == pytest.approx(1.2 - 0.15, abs=0.02)
    assert float(hits.distance[0]) == pytest.approx(0.15, abs=1e-3)


def test_march_never_hit_net_no_inner():
    """presence < 0 and no inner shell -> rays pass through."""
    outer, inner, cfg, params = _march_setup(inner_present=False)
    net = crafted_net_params(cfg, presence=-1.0)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    origins = np.broadcast_to([0.0, 0.0, 3.0], (1, 3))
    dirs = np.array([[0.0, 0.0, -1.0]])
    hits = _march(ctx, params, origins, dirs)
    assert not bool(hits.hit[0])


def test_march_inner_shell_forces_hit():
    """presence < 0 but the inner shell lies before the outer exit ->
    forced intersection (applySegmentNeuralOutputKernel :1058-1063)."""
    outer, inner, cfg, params = _march_setup(inner_present=True)
    net = crafted_net_params(cfg, presence=-1.0, distance=0.3)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    origins = np.broadcast_to([0.0, 0.0, 3.0], (1, 3))
    dirs = np.array([[0.0, 0.0, -1.0]])
    hits = _march(ctx, params, origins, dirs)
    assert bool(hits.hit[0])
    # Central ray: outer entry 1.2 -> inner enter at t=0.4 from entry;
    # clamp keeps hit within the inner boundary.
    assert float(hits.position[2, 0]) == pytest.approx(1.2 - 0.3, abs=0.02)


def test_march_from_rays_inside_shell():
    """Bounce rays starting between the shells exit backward then re-enter
    (traceOuterShellEntryFromRaysKernel :820-832)."""
    outer, inner, cfg, params = _march_setup()
    net = crafted_net_params(cfg, presence=1.0, distance=0.05)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    # Start just outside the inner shell surface heading out through the gap;
    # the ray is inside the outer shell so FORWARD_ONLY misses first.
    origins = np.array([[0.0, 0.0, 1.0]])
    dirs = np.array([[1.0, 0.0, 0.0]])
    hits = jax.jit(lambda c, p, o, d: trace_neural_segments(
        c, p, o, d, camera_rays=False, compute_dtype=jnp.float32))(
        ctx, params, jnp.asarray(np.asarray(origins, np.float32).T),
        jnp.asarray(np.asarray(dirs, np.float32).T))
    # The ray exits the outer shell; with no re-entry it can only hit if the
    # net fires inside a segment — here there is no segment after exit, so
    # this must simply terminate without NaNs.
    assert np.isfinite(np.asarray(hits.position)).all()


def test_march_constant_neural_color():
    outer, inner, cfg, params = _march_setup()
    import dataclasses
    params = dataclasses.replace(
        params,
        use_constant_neural_color=jnp.asarray(True),
        constant_neural_color=jnp.asarray([0.2, 0.4, 0.6], jnp.float32))
    net = crafted_net_params(cfg, presence=1.0, distance=0.1)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    origins = np.broadcast_to([0.0, 0.0, 3.0], (1, 3))
    dirs = np.array([[0.0, 0.0, -1.0]])
    hits = _march(ctx, params, origins, dirs)
    np.testing.assert_allclose(np.asarray(hits.albedo[:, 0]), [0.2, 0.4, 0.6],
                               atol=1e-6)

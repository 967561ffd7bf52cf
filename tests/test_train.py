"""Training subsystem tests: dataset supervision, losses, optimization
progress, checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.train import (
    LossWeights, SegmentBatch, TrainConfig, bce_with_logits,
    export_reference_blob, init_train_state, make_train_step,
    sample_segment_batch, shell_losses)

from util import outward_sphere


def _shell_setup():
    gt = outward_sphere(12, 24, 1.0).to_arrays()
    outer = outward_sphere(10, 20, 1.2).to_arrays()
    inner = outward_sphere(10, 20, 0.8).to_arrays()
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    inv = 1.0 / (omax - omin)
    return gt, outer, inner, jnp.asarray(omin), jnp.asarray(inv)


def test_segment_batch_global_material_color():
    """Color supervision for material_id < 0 hits must come from the SCENE's
    global-material row (what the renderer resolves against), not the default
    material — regression for the knot scene rendering grey (the sphere
    config's 0.8-grey base_color coincided with the default and hid this)."""
    from neural_renderer_tpu.scene.materials import (Material,
                                                     MaterialParamVec3)
    gt, outer, inner, omin, inv = _shell_setup()
    mat = Material.default()
    mat.base_color = MaterialParamVec3.constant((0.85, 0.55, 0.25))
    row = jnp.asarray(np.asarray(mat.scalar_row()), jnp.float32)
    batch = jax.jit(lambda k: sample_segment_batch(
        k, gt, outer, inner, omin, inv, 512, radius=3.0,
        global_row=row))(jax.random.PRNGKey(0))
    hit = np.asarray(batch.valid) & (np.asarray(batch.presence) > 0.5)
    assert hit.sum() > 10
    color = np.asarray(batch.color)[:, hit]
    np.testing.assert_allclose(color[0], 0.85, atol=1e-6)
    np.testing.assert_allclose(color[1], 0.55, atol=1e-6)
    np.testing.assert_allclose(color[2], 0.25, atol=1e-6)


def test_segment_batch_supervision():
    gt, outer, inner, omin, inv = _shell_setup()
    batch = jax.jit(lambda k: sample_segment_batch(
        k, gt, outer, inner, omin, inv, 512, radius=3.0))(jax.random.PRNGKey(0))
    valid = np.asarray(batch.valid)
    presence = np.asarray(batch.presence)
    assert valid.mean() > 0.5          # most rays cross the shell
    assert 0.05 < presence[valid].mean() < 1.0
    # Hits: distance must place the point near the unit sphere.
    inputs = np.asarray(batch.inputs)  # [12, B]
    dist = np.asarray(batch.distance)
    pos_mask = presence > 0.5
    assert pos_mask.sum() > 10
    # Entry (denormalized) + dist*dir lands on radius ~1.
    entry = (inputs[:3] / np.asarray(inv)[:, None] + np.asarray(omin)[:, None]).T
    d = (inputs[9:12] * 2.0 - 1.0).T
    hit_pos = entry[pos_mask] + d[pos_mask] * dist[pos_mask][:, None]
    radii = np.linalg.norm(hit_pos, axis=1)
    assert np.abs(radii - 1.0).max() < 0.05
    # Normals are unit and roughly radial.
    n = np.asarray(batch.normal).T[pos_mask]
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
    dots = np.abs(np.sum(n * hit_pos / radii[:, None], axis=1))
    assert dots.mean() > 0.95


def test_multisegment_sampling():
    """segments_per_ray marches sampled rays through re-entries: later
    blocks carry live rows for non-convex shells (knot) and are all-invalid
    for convex ones (sphere — no re-entry exists)."""
    from test_knot_scene import knot_mesh  # tests/ is on pytest's rootdir path

    b, s = 768, 3
    # Convex sphere: block 1 valid like before, blocks 2..s dead.
    gt, outer, inner, omin, inv = _shell_setup()
    batch = jax.jit(lambda k: sample_segment_batch(
        k, gt, outer, inner, omin, inv, b, radius=3.0,
        segments_per_ray=s))(jax.random.PRNGKey(0))
    assert batch.valid.shape == (b,) and batch.inputs.shape == (12, b)
    rays = b // s
    valid = np.asarray(batch.valid)
    assert valid[:rays].mean() > 0.5
    assert not valid[rays:].any()

    # Knot: strand re-entries make later blocks live, with real GT hits.
    gt_k = knot_mesh(96, 0.35, 12).to_arrays()
    inner_k = knot_mesh(96, 0.22, 12).to_arrays()
    outer_k = knot_mesh(96, 0.50, 12).to_arrays()
    omin_k = jnp.asarray(np.asarray(outer_k.bvh_bounds_min[:, 0]))
    omax_k = np.asarray(outer_k.bvh_bounds_max[:, 0])
    inv_k = jnp.asarray(1.0 / (omax_k - np.asarray(omin_k)))
    bk = jax.jit(lambda k: sample_segment_batch(
        k, gt_k, outer_k, inner_k, omin_k, inv_k, b, radius=6.0,
        segments_per_ray=s))(jax.random.PRNGKey(1))
    vk = np.asarray(bk.valid)
    pk = np.asarray(bk.presence)
    assert vk[rays:2 * rays].mean() > 0.05      # second segments exist
    assert pk[rays:][vk[rays:]].mean() > 0.05   # ...and some contain GT hits
    # Later-segment inputs stay in the normalized [0,1]-ish domain.
    inp = np.asarray(bk.inputs)[:, rays:][:, vk[rays:]]
    assert inp.min() > -0.05 and inp.max() < 1.05


def test_bce_matches_reference_formula():
    logits = jnp.asarray([-3.0, -0.5, 0.0, 0.5, 3.0])
    targets = jnp.asarray([0.0, 1.0, 1.0, 0.0, 1.0])
    got = np.asarray(bce_with_logits(logits, targets))
    p = 1.0 / (1.0 + np.exp(-np.asarray(logits)))
    want = -(np.asarray(targets) * np.log(p) + (1 - np.asarray(targets)) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_losses_masking():
    outputs = jnp.zeros((16, 4))
    batch = SegmentBatch(
        inputs=jnp.zeros((12, 4)),
        presence=jnp.asarray([1.0, 0.0, 1.0, 0.0]),
        distance=jnp.asarray([0.5, 0.0, 0.2, 0.0]),
        normal=jnp.asarray([[0, 0, 1.0]] * 4).T,
        color=jnp.full((3, 4), 0.5),
        valid=jnp.asarray([True, True, False, False]))
    total, parts = shell_losses(outputs, batch)
    # Only rows 0,1 valid; only row 0 positive.
    assert float(parts["distance"]) == pytest.approx(0.5, abs=1e-5)
    assert float(parts["presence"]) == pytest.approx(np.log(2), abs=1e-4)
    assert np.isfinite(float(total))


def test_training_reduces_loss():
    """A short optimization run on the sphere shells must cut the loss
    substantially (the end-to-end check that gradients flow through the
    hash-grid gathers and the MLP)."""
    gt, outer, inner, omin, inv = _shell_setup()
    net_config = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8,
                                 n_levels=4, mlp_width=64, mlp_hidden_layers=2,
                                 padded_output_dims=16)
    cfg = TrainConfig(batch_size=2048, learning_rate=2e-3,
                      compute_dtype="float32", seed=0)
    state = init_train_state(cfg, net_config)
    step = make_train_step(cfg, net_config, gt, outer, inner, omin, inv,
                           radius=3.0, donate=False)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub)
        losses.append(float(metrics["total"]))
    assert losses[-1] < 0.5 * losses[0]
    assert np.isfinite(losses).all()


def test_export_blob_loads_back(tmp_path):
    net_config = nbvh.NbvhConfig()
    cfg = TrainConfig()
    state = init_train_state(cfg, net_config)
    path = str(tmp_path / "weights.bin")
    export_reference_blob(path, state, net_config)
    loaded = nbvh.load_flat_blob(path, net_config)
    np.testing.assert_allclose(np.asarray(state.params["mlp"][0]),
                               np.asarray(loaded["mlp"][0]), atol=2e-3)


def test_sampler_sweep_matches_traced_oracle():
    """The fused-sweep sampler (ONE dual-shell sweep per segment, entry +
    segment-0 + re-entry derived from crossing alternation) must agree with
    the literal 4-trace reference-shaped oracle on essentially every row —
    only FP-grazing rays may differ (the march tolerates the same class).
    Checked on concentric spheres (s=1) AND a non-convex multi-segment
    case (s=3, offset shells so re-entries occur)."""
    import jax
    import numpy as np
    from neural_renderer_tpu.train.dataset import sample_segment_batch
    from util import outward_sphere, two_lobe_sphere

    def check(gt, outer, inner, omin, inv, radius, s_values):
        for s in s_values:
            a = sample_segment_batch(jax.random.PRNGKey(7), gt, outer, inner,
                                     omin, inv, 4096, radius, s, sweep=True)
            b = sample_segment_batch(jax.random.PRNGKey(7), gt, outer, inner,
                                     omin, inv, 4096, radius, s, sweep=False)
            same_valid = np.mean(np.asarray(a.valid) == np.asarray(b.valid))
            assert same_valid > 0.999, (s, same_valid)
            both = np.asarray(a.valid) & np.asarray(b.valid)
            pres_agree = np.mean(
                np.asarray(a.presence)[both] == np.asarray(b.presence)[both])
            assert pres_agree > 0.999, (s, pres_agree)
            agree = both & (np.asarray(a.presence) == np.asarray(b.presence))
            din = np.abs(np.asarray(a.inputs) - np.asarray(b.inputs))[:, both]
            assert np.quantile(din, 0.999) < 1e-4, (s, np.quantile(din, 0.999))
            dd = np.abs(np.asarray(a.distance)
                        - np.asarray(b.distance))[agree]
            assert np.quantile(dd, 0.999) < 1e-4, (s, np.quantile(dd, 0.999))

    gt = outward_sphere(12, 24, 1.0).to_arrays()
    outer = outward_sphere(10, 20, 1.2).to_arrays()
    inner = outward_sphere(10, 20, 0.8).to_arrays()
    omin = jnp.asarray([-1.2, -1.2, -1.2], jnp.float32)
    inv = jnp.asarray([1 / 2.4] * 3, jnp.float32)
    check(gt, outer, inner, omin, inv, 3.6, (1, 2))

    # Non-convex offset shells: two disjoint lobes, so rays through both get
    # genuine RE-ENTRIES and segments 2/3 exercise the GT carry-over.
    gt2 = two_lobe_sphere(1.0, 1.5).to_arrays()
    out2 = two_lobe_sphere(1.2, 1.5).to_arrays()
    in2 = two_lobe_sphere(0.8, 1.5).to_arrays()
    omin2 = jnp.asarray([-2.7, -1.2, -1.2], jnp.float32)
    inv2 = jnp.asarray([1 / 5.4, 1 / 2.4, 1 / 2.4], jnp.float32)
    check(gt2, out2, in2, omin2, inv2, 4.5, (3,))


def test_sampler_sweep_gt_outside_shell():
    """GT surface poking OUTSIDE the coarse outer shell (radius 1.3 lobes vs
    1.2 shells): a carried GT hit can lie BEFORE a later segment's entry.
    The old carry clamped it to t=0 (presence=1, distance=0, stale normal);
    the guarded sampler must match the literal re-tracing oracle instead."""
    import jax
    import numpy as np
    from neural_renderer_tpu.train.dataset import sample_segment_batch
    from util import two_lobe_sphere

    # GT lobes shifted inward (offset 1.25 vs shells at 1.5): each GT lobe
    # pokes out of its outer shell into the inter-lobe gap, so a ray that
    # exits lobe A with an unconsumed GT hit and re-enters lobe B carries a
    # hit lying BEFORE the new entry.
    gt = two_lobe_sphere(1.0, 1.25).to_arrays()
    outer = two_lobe_sphere(1.2, 1.5).to_arrays()
    inner = two_lobe_sphere(0.8, 1.5).to_arrays()
    omin = jnp.asarray([-2.7, -1.2, -1.2], jnp.float32)
    inv = jnp.asarray([1 / 5.4, 1 / 2.4, 1 / 2.4], jnp.float32)
    a = sample_segment_batch(jax.random.PRNGKey(3), gt, outer, inner,
                             omin, inv, 4096, 4.5, 3, sweep=True)
    b = sample_segment_batch(jax.random.PRNGKey(3), gt, outer, inner,
                             omin, inv, 4096, 4.5, 3, sweep=False)
    both = np.asarray(a.valid) & np.asarray(b.valid)
    pres_agree = np.mean(
        np.asarray(a.presence)[both] == np.asarray(b.presence)[both])
    assert pres_agree > 0.995, pres_agree
    # Fixture sanity: the scene must actually produce presence rows.
    assert np.asarray(a.presence)[both].sum() > 50
    # No presence row may carry a zeroed distance with a nonzero GT surface
    # in front (the stale-clamp signature): distances on agreeing rows match.
    agree = both & (np.asarray(a.presence) == np.asarray(b.presence))
    pa = np.asarray(a.presence)[agree] > 0
    assert pa.sum() > 0
    dd = np.abs(np.asarray(a.distance) - np.asarray(b.distance))[agree][pa]
    assert np.quantile(dd, 0.995) < 1e-3, np.quantile(dd, 0.995)

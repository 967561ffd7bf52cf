"""Two-level clustered dense tracing (ops/trace_cluster.py).

Level-0 logic (cluster bounds, t-ordered worklists, overflow) is pure
XLA/numpy and tests everywhere; the Pallas streaming-sweep parity runs on
TPU (CPU platforms dispatch large meshes to the BVH walk, covered by
test_mesh_and_bvh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_renderer_tpu.ops import trace_cluster as tc
from neural_renderer_tpu.ops import traversal
from util import outward_sphere


def test_cluster_bounds_cover_triangles(rng):
    v0 = rng.normal(size=(3, 700)).astype(np.float32)
    e1 = rng.normal(size=(3, 700)).astype(np.float32)
    e2 = rng.normal(size=(3, 700)).astype(np.float32)
    tp = np.concatenate([v0, e1, e2], axis=0)
    cb = tc.cluster_bounds_from_packed(tp, 700)
    assert cb.shape == (6, 3)  # ceil(700/256)
    corners = np.stack([v0, v0 + e1, v0 + e2])  # [3corner, 3, T]
    for c in range(3):
        lo, hi = c * 256, min((c + 1) * 256, 700)
        sel = corners[:, :, lo:hi]
        np.testing.assert_allclose(cb[0:3, c], sel.min(axis=(0, 2)), rtol=1e-6)
        np.testing.assert_allclose(cb[3:6, c], sel.max(axis=(0, 2)), rtol=1e-6)


def test_cluster_bounds_padding_never_hits():
    tp = np.zeros((9, 10), np.float32)
    cb = tc.cluster_bounds_from_packed(tp, 4)
    assert cb.shape == (6, 1)
    # Real triangles are all at the origin; bounds must ignore cols >= 4
    # (they're identical here) and an ALL-padding cluster must invert.
    cb2 = tc.cluster_bounds_from_packed(np.zeros((9, 300), np.float32), 0)
    assert (cb2[0:3] > cb2[3:6]).all()


def test_stream_worklist_t_order_and_padding():
    mask = np.zeros((2, 5), bool)
    mask[0, [1, 3]] = True
    mask[1, [0, 2, 4]] = True
    tmin = np.full((2, 5), np.inf, np.float32)
    tmin[0, [1, 3]] = [7.0, 2.0]          # cluster 3 is nearer: comes first
    tmin[1, [0, 2, 4]] = [5.0, 1.0, 3.0]
    ids, tmins, counts, overflow = jax.tree_util.tree_map(
        np.asarray, tc._stream_worklist(jnp.asarray(mask),
                                        jnp.asarray(tmin), 1024))
    k = ids.shape[0] // 2
    assert k % 1024 == 0                  # 1D DMA rows are 1024-aligned
    assert counts.tolist() == [2, 3]
    assert not overflow.any()
    assert ids[:2].tolist() == [3, 1]
    assert tmins[:2].tolist() == [2.0, 7.0]
    assert ids[k:k + 3].tolist() == [2, 4, 0]
    assert tmins[k:k + 3].tolist() == [1.0, 3.0, 5.0]
    assert np.isinf(tmins[2:5]).all()     # dead slots carry +inf


def test_stream_worklist_overflow_clamps_counts():
    mask = np.ones((1, 6), bool)
    tmin = np.arange(6, dtype=np.float32)[None]
    ids, tmins, counts, overflow = jax.tree_util.tree_map(
        np.asarray, tc._stream_worklist(jnp.asarray(mask),
                                        jnp.asarray(tmin), 4))
    assert counts.tolist() == [4]
    assert overflow.tolist() == [True]
    assert ids[:4].tolist() == [0, 1, 2, 3]


def test_mesh_exit_t_caps_and_masks():
    cb = jnp.asarray(np.array(
        [[-1.0], [-1.0], [-1.0], [1.0], [1.0], [1.0]], np.float32))
    o = jnp.asarray(np.array([[0, 0, 5], [0, 0, 0], [-3, -3, 0]], np.float32))
    d = jnp.asarray(np.array([[0, 0, 0], [0, 0, 1], [1, 1, 0]], np.float32))
    # ray0: inside box heading +z -> exit at z=1 -> t=4 from origin z=-3
    # ray1: misses entirely (parallel, outside) -> 0
    # ray2: starts at x=5 heading +y -> misses -> 0
    ex = np.asarray(tc.mesh_exit_t(o, d, cb, jnp.asarray([True, False, True])))
    np.testing.assert_allclose(ex[0], 4.0, rtol=1e-6)
    assert ex[1] == 0.0                   # inactive is masked to 0
    assert ex[2] == 0.0


def test_block_cluster_mask_matches_per_ray(rng):
    n = tc.BLOCK_RAYS * 2
    o = jnp.asarray(rng.normal(size=(3, n)) * 3, jnp.float32)
    d = jnp.asarray(rng.normal(size=(3, n)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    cb = jnp.asarray(np.array([[-1, 0.5], [-1, 0.5], [-1, 0.5],
                               [1, 1.5], [1, 1.5], [1, 1.5]], np.float32))
    mask = np.asarray(tc._block_cluster_mask(o, d, cb, None))
    # Reference: per-ray slab, numpy.
    on, dn = np.asarray(o), np.asarray(d)
    inv = 1.0 / np.where(np.abs(dn) < 1e-30,
                         np.where(dn < 0, -1e-30, 1e-30), dn)
    for c in range(2):
        lo = np.asarray(cb[0:3, c])[:, None]
        hi = np.asarray(cb[3:6, c])[:, None]
        t0 = (lo - on) * inv
        t1 = (hi - on) * inv
        tmin = np.minimum(t0, t1).max(axis=0)
        tmax = np.maximum(t0, t1).min(axis=0)
        hit = (tmax >= np.maximum(tmin, 0.0)) & (tmax > tc.MIN_T)
        blocks = hit.reshape(2, tc.BLOCK_RAYS).any(axis=1)
        np.testing.assert_array_equal(mask[:, c], blocks)


def _big_mesh():
    mesh = outward_sphere(104, 200, 1.0)   # 41,600 tris > DENSE_MAX
    return mesh.to_arrays()


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(3, n)).astype(np.float32) * 3.0
    target = rng.normal(size=(3, n)).astype(np.float32) * 0.5
    d = target - o
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="two-level Pallas sweep requires the TPU backend")
@pytest.mark.parametrize("mode", [traversal.ANY, traversal.FORWARD_ONLY,
                                  traversal.BACKWARD_ONLY])
def test_two_level_matches_brute_tpu(mode):
    arrays = _big_mesh()
    assert arrays.num_triangles > traversal.DENSE_MAX_TRIANGLES
    o, d = _rays(2048)
    res = jax.jit(lambda o, d: traversal.trace_mesh(arrays, o, d, mode))(o, d)
    ref = jax.jit(
        lambda o, d: traversal.trace_mesh_brute(arrays, o, d, mode))(o, d)
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)
    h = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(res.tri)[h],
                                  np.asarray(ref.tri)[h])


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="two-level Pallas sweep requires the TPU backend")
def test_two_level_overflow_fallback_exact(monkeypatch):
    """Force worklist truncation (STREAM_K=2) — the compacted BVH-walk
    fallback must keep the result exact."""
    monkeypatch.setattr(tc, "STREAM_K", 2)
    arrays = _big_mesh()
    o, d = _rays(1024, seed=7)
    res = jax.jit(lambda o, d: traversal.trace_mesh(arrays, o, d,
                                                    traversal.ANY))(o, d)
    ref = jax.jit(lambda o, d: traversal.trace_mesh_brute(
        arrays, o, d, traversal.ANY))(o, d)
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(ref.hit))
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)

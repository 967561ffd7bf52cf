"""Pallas kernels: fused MLP parity and dense-trace parity vs oracles.

On the TPU these run compiled; on CPU backends the dense Pallas kernel is not
exercised (traversal dispatches to the XLA tile path, which these tests cover
through trace_mesh itself).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.ops import traversal
from neural_renderer_tpu.ops.fused_network import apply_fused, pack_weights

from util import outward_sphere


def test_pack_weights_shapes():
    cfg = nbvh.NbvhConfig()
    params = nbvh.init_params(jax.random.PRNGKey(0), cfg)
    mats = pack_weights(params, cfg)
    assert [m.shape for m in mats] == [(128, 128)] * 5
    assert all(m.dtype == jnp.bfloat16 for m in mats)
    # Padding columns/rows are zero (layer 0 input pads 112 -> 128).
    assert float(jnp.abs(mats[0][112:]).max()) == 0.0


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fused Pallas MLP requires the TPU backend")
def test_apply_fused_matches_xla():
    cfg = nbvh.NbvhConfig()
    params = nbvh.init_params(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(12, 777)), jnp.float32)
    ref = np.asarray(nbvh.apply(params, x, cfg, compute_dtype=jnp.bfloat16))
    out = np.asarray(apply_fused(params, x, cfg))
    assert out.shape == ref.shape == (16, 777)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(ref - out).max() / scale < 1e-3


def test_dense_and_bvh_paths_agree(rng):
    """Force both production paths on the same mesh and compare: the dense
    path (small-mesh default) vs the BVH threaded-DFS walk."""
    mesh = outward_sphere(16, 32, 1.0).to_arrays()
    n = 512
    origins = rng.normal(size=(n, 3))
    origins = origins / np.linalg.norm(origins, axis=1, keepdims=True) * 3.0
    targets = rng.normal(size=(n, 3)) * 0.4
    d = targets - origins
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(origins.T, jnp.float32)
    dd = jnp.asarray(d.T, jnp.float32)

    for mode in (traversal.ANY, traversal.FORWARD_ONLY, traversal.BACKWARD_ONLY):
        dense = traversal._trace_dense(mesh, o, dd, mode, None)
        bvh = traversal._trace_bvh(mesh, o, dd, mode, None)
        np.testing.assert_array_equal(np.asarray(dense.hit), np.asarray(bvh.hit))
        h = np.asarray(dense.hit)
        np.testing.assert_allclose(np.asarray(dense.t)[h], np.asarray(bvh.t)[h],
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(dense.tri)[h],
                                      np.asarray(bvh.tri)[h])


def test_trace_dispatch_threshold():
    small = outward_sphere(8, 16, 1.0).to_arrays()      # 256 tris -> dense
    assert small.num_triangles <= traversal.DENSE_MAX_TRIANGLES
    # Both paths must at least run and agree on an easy axial ray.
    o = jnp.asarray([[0.0], [0.0], [3.0]], jnp.float32)
    d = jnp.asarray([[0.0], [0.0], [-1.0]], jnp.float32)
    res = traversal.trace_mesh(small, o, d, traversal.FORWARD_ONLY)
    assert bool(res.hit[0])
    assert float(res.t[0]) == pytest.approx(2.0, abs=2e-2)

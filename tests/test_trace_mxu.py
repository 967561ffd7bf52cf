"""MXU Möller–Trumbore formulation (ops/trace_mxu.py): the bilinear
factorization must reproduce the per-pair oracle (trace_mesh_brute /
_mt_from_packed math) — exact identities in f64, ~1-ulp agreement in the
f32 XLA twin, and hit-for-hit agreement on real meshes in all TraceModes."""

import numpy as np

import jax
import jax.numpy as jnp

from neural_renderer_tpu.ops import traversal
from neural_renderer_tpu.ops.trace_mxu import (ray_features,
                                               trace_dense_mxu_xla,
                                               tri_features)

from util import outward_sphere


def test_bilinear_identities_f64():
    rng = np.random.default_rng(0)
    n, t = 64, 48
    o = rng.normal(size=(3, n))
    d = rng.normal(size=(3, n))
    v0 = rng.normal(size=(3, t))
    e1 = rng.normal(size=(3, t))
    e2 = rng.normal(size=(3, t))

    # f64 oracle (per-pair triple products)
    pvec = np.cross(d.T[:, None, :], e2.T[None, :, :])
    det = np.einsum("tk,ntk->nt", e1.T, pvec)
    tvec = o.T[:, None, :] - v0.T[None, :, :]
    u_num = np.einsum("ntk,ntk->nt", tvec, pvec)
    qvec = np.cross(tvec, e1.T[None, :, :])
    v_num = np.einsum("nk,ntk->nt", d.T, qvec)
    t_num = np.einsum("tk,ntk->nt", e2.T, qvec)

    F = np.asarray(ray_features(jnp.asarray(o, jnp.float32),
                                jnp.asarray(d, jnp.float32)), np.float64)
    # Rebuild features in f64 from the same layout to check the identity
    # itself (not f32 rounding).
    tb = jnp.asarray(np.concatenate([v0, e1, e2], axis=0), jnp.float32)
    feats = [np.asarray(f, np.float64) for f in tri_features(tb)]
    for name, ref, f in zip("det u v t".split(),
                            (det, u_num, v_num, t_num), feats):
        got = F.T @ f
        scale = np.abs(ref).max() + 1.0
        np.testing.assert_allclose(got, ref, atol=2e-5 * scale,
                                   err_msg=name)


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 3.0
    tgt = rng.normal(size=(n, 3)) * 0.6
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(o.T, jnp.float32), jnp.asarray(d.T, jnp.float32))


def test_mxu_twin_matches_brute_all_modes():
    mesh = outward_sphere(12, 24, 1.0).to_arrays()
    o, d = _rays(2048)
    tp = mesh.tris_packed
    for mode in (traversal.ANY, traversal.FORWARD_ONLY,
                 traversal.BACKWARD_ONLY):
        ref = traversal.trace_mesh_brute(mesh, o, d, mode)
        best_t, best_tri = jax.jit(trace_dense_mxu_xla,
                                   static_argnums=3)(o, d, tp, mode)
        hit = np.asarray(best_t) < 1e30
        want = np.asarray(ref.hit)
        # FP boundary flips only (the MXU dots reassociate).
        assert (hit != want).mean() < 2e-3, mode
        both = hit & want
        assert both.sum() > 300
        np.testing.assert_allclose(np.asarray(best_t)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-5, atol=1e-5)
        same_tri = (np.asarray(best_tri)[both]
                    == np.asarray(ref.tri)[both])
        assert same_tri.mean() > 0.999, mode


def test_mxu_dual_facing_split_matches_sweep():
    """The sweep kernels split forward/backward from det's sign (facing =
    -det); the split must reproduce the facing-culled closest hits."""
    from neural_renderer_tpu.ops.trace_mxu import pair_eval_raw
    mesh = outward_sphere(10, 20, 1.0).to_arrays()
    o, d = _rays(1024, seed=7)
    t, ok, det = pair_eval_raw(ray_features(o, d), mesh.tris_packed)
    valid = ok & (t > traversal.MIN_T)
    t_fwd = jnp.min(jnp.where(valid & (det > 0), t, 1e30), axis=1)
    t_bwd = jnp.min(jnp.where(valid & (det < 0), t, 1e30), axis=1)
    for got, mode in ((t_fwd, traversal.FORWARD_ONLY),
                      (t_bwd, traversal.BACKWARD_ONLY)):
        ref = traversal.trace_mesh_brute(mesh, o, d, mode)
        hit = np.asarray(got) < 1e30
        want = np.asarray(ref.hit)
        assert (hit != want).mean() < 2e-3, mode
        both = hit & want
        assert both.sum() > 200
        np.testing.assert_allclose(np.asarray(got)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-5, atol=1e-5)


def test_padding_triangles_never_hit():
    mesh = outward_sphere(6, 12, 1.0).to_arrays()
    o, d = _rays(256, seed=3)
    tp = jnp.pad(mesh.tris_packed, ((0, 0), (0, 37)))  # zero padding tris
    best_t, _ = trace_dense_mxu_xla(o, d, tp, traversal.ANY)
    ref = traversal.trace_mesh_brute(mesh, o, d, traversal.ANY)
    hit = np.asarray(best_t) < 1e30
    assert (hit != np.asarray(ref.hit)).mean() < 2e-3

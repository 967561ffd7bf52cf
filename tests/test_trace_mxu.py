"""MXU Möller–Trumbore formulation (ops/trace_mxu.py): the bilinear
factorization must reproduce the per-pair oracle (trace_mesh_brute /
_mt_from_packed math) — exact identities in f64, ~1-ulp agreement in the
f32 XLA twin, and hit-for-hit agreement on real meshes in all TraceModes."""

import numpy as np
import pytest

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


def test_mxu_pallas_kernel_interpret_matches_twin():
    """The Pallas kernel body (grid indexing, tile loop, argmin tie-break,
    output bitcast packing) run in interpret mode must agree with the XLA
    twin — the kernel's only CPU-executable validation before TPU time."""
    from neural_renderer_tpu.ops.trace_mxu import trace_dense_mxu_pallas
    from neural_renderer_tpu.ops.trace_pallas import BLOCK_RAYS, TRI_TILE
    mesh = outward_sphere(8, 16, 1.0).to_arrays()
    tp = mesh.tris_packed
    t_pad = -(-tp.shape[1] // TRI_TILE) * TRI_TILE
    tp = jnp.pad(tp, ((0, 0), (0, t_pad - tp.shape[1])))
    o, d = _rays(BLOCK_RAYS * 2, seed=5)
    for mode in (traversal.ANY, traversal.FORWARD_ONLY):
        bt_k, id_k = trace_dense_mxu_pallas(o, d, tp, mode,
                                            t_pad // TRI_TILE,
                                            interpret=True)
        bt_x, id_x = trace_dense_mxu_xla(o, d, tp, mode)
        hit_k = np.asarray(bt_k) < 1e30
        hit_x = np.asarray(bt_x) < 1e30
        # Same formulation, possibly different dot lowering: allow only
        # boundary-ulp drift.
        assert (hit_k != hit_x).mean() < 2e-3, mode
        both = hit_k & hit_x
        assert both.sum() > 200
        np.testing.assert_allclose(np.asarray(bt_k)[both],
                                   np.asarray(bt_x)[both],
                                   rtol=1e-6, atol=1e-6)
        assert (np.asarray(id_k)[both]
                == np.asarray(id_x)[both]).mean() > 0.999


@pytest.mark.parametrize("mxu", [False, True])
def test_streaming_sweep_kernel_interpret(mxu, monkeypatch):
    """The streaming cluster sweep kernel (DMA worklists + in-kernel
    while_loop), VPU and MXU branches, run under Pallas interpret mode
    against the dense t-only oracle — the kernels' only CPU-executable
    validation before TPU time."""
    from neural_renderer_tpu.ops import trace_cluster as tc

    outer = outward_sphere(24, 48, 1.2).to_arrays()
    inner = outward_sphere(24, 48, 0.8).to_arrays()
    o, d = _rays(1024, seed=11)

    co = outer.cluster_bounds.shape[1]
    ci = inner.cluster_bounds.shape[1]
    cb = jnp.concatenate([outer.cluster_bounds, inner.cluster_bounds], axis=1)

    def padtp(m, c):
        tp = m.tris_packed
        want = c * tc.CLUSTER_SIZE
        return (jnp.pad(tp, ((0, 0), (0, want - tp.shape[1])))
                if tp.shape[1] != want else tp)

    tp_cl = jnp.concatenate([padtp(outer, co), padtp(inner, ci)], axis=1)
    mask = tc._block_cluster_mask(o, d, cb, None)
    ids, _, counts, _ = tc._stream_worklist(
        mask, jnp.where(mask, 0.0, jnp.inf), tc.STREAM_K)
    out = tc.sweep_clusters_stream(o, d, tp_cl, ids, counts, co,
                                   with_fwd2=True, mxu=mxu, interpret=True)

    of, of2 = traversal._dense_t_only(outer, o, d, traversal.FORWARD_ONLY,
                                      two_min=True)
    refs = [of,
            traversal._dense_t_only(outer, o, d, traversal.BACKWARD_ONLY),
            traversal._dense_t_only(inner, o, d, traversal.FORWARD_ONLY),
            traversal._dense_t_only(inner, o, d, traversal.BACKWARD_ONLY),
            of2]
    for row, ref in enumerate(refs):
        got = np.asarray(out[row])
        want = np.asarray(ref)
        hg, hw = got < 1e30, want < 1e30
        assert (hg != hw).mean() < 2e-3, row
        both = hg & hw
        np.testing.assert_allclose(got[both], want[both],
                                   rtol=1e-5, atol=1e-6, err_msg=f"row {row}")


@pytest.mark.parametrize("mxu", [False, True])
def test_streaming_trace_kernel_interpret(mxu, monkeypatch):
    """Closest-hit streaming cluster trace (front-to-back early-out +
    whole-mesh-exit cap) under interpret mode vs the brute oracle."""
    from neural_renderer_tpu.ops import trace_cluster as tc

    mesh = outward_sphere(24, 48, 1.0).to_arrays()
    o, d = _rays(1024, seed=13)
    c = mesh.cluster_bounds.shape[1]
    want_cols = c * tc.CLUSTER_SIZE
    tp = mesh.tris_packed
    if tp.shape[1] != want_cols:
        tp = jnp.pad(tp, ((0, 0), (0, want_cols - tp.shape[1])))
    mask, btmin = tc._block_cluster_mask(o, d, mesh.cluster_bounds, None,
                                         with_tmin=True)
    ids, tmins, counts, _ = tc._stream_worklist(mask, btmin, tc.STREAM_K)
    exit_t = tc.mesh_exit_t(o, d, mesh.cluster_bounds, None)
    bt, tri = tc.trace_clusters_stream(o, d, tp, ids, tmins, counts, exit_t,
                                       0, mxu=mxu, interpret=True)

    ref = traversal.trace_mesh_brute(mesh, o, d, traversal.ANY)
    hit = np.asarray(bt) < 1e30
    want = np.asarray(ref.hit)
    assert (hit != want).mean() < 2e-3
    both = hit & want
    assert both.sum() > 300
    np.testing.assert_allclose(np.asarray(bt)[both], np.asarray(ref.t)[both],
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(tri)[both] == np.asarray(ref.tri)[both]).mean() > 0.99


@pytest.mark.parametrize("mxu", [False, True])
def test_dense_sweep_kernel_interpret(mxu, monkeypatch):
    """Dense dual-shell sweep kernel (small-shell path), VPU and MXU
    branches, under interpret mode vs the dense t-only oracle."""
    from neural_renderer_tpu.ops import trace_pallas as tp_mod

    outer = outward_sphere(10, 20, 1.2).to_arrays()
    inner = outward_sphere(10, 20, 0.8).to_arrays()
    o, d = _rays(512, seed=17)

    def pad_tiles(m):
        tp = m.tris_packed
        w = tp_mod.SWEEP_TRI_TILE  # the sweep kernel's own tile width
        pad = -(-tp.shape[1] // w) * w
        return (jnp.pad(tp, ((0, 0), (0, pad - tp.shape[1]))),
                pad // w)

    tpo, to = pad_tiles(outer)
    tpi, ti = pad_tiles(inner)
    out = tp_mod.sweep_shells_pallas(
        o, d, jnp.concatenate([tpo, tpi], axis=1), to, to + ti,
        with_fwd2=True, mxu=mxu, interpret=True)

    of, of2 = traversal._dense_t_only(outer, o, d, traversal.FORWARD_ONLY,
                                      two_min=True)
    refs = [of,
            traversal._dense_t_only(outer, o, d, traversal.BACKWARD_ONLY),
            traversal._dense_t_only(inner, o, d, traversal.FORWARD_ONLY),
            traversal._dense_t_only(inner, o, d, traversal.BACKWARD_ONLY),
            of2]
    for row, ref in enumerate(refs):
        got = np.asarray(out[row])
        want = np.asarray(ref)
        hg, hw = got < 1e30, want < 1e30
        assert (hg != hw).mean() < 2e-3, row
        both = hg & hw
        np.testing.assert_allclose(got[both], want[both],
                                   rtol=1e-5, atol=1e-6, err_msg=f"row {row}")


@pytest.mark.parametrize("mxu", [False, True])
def test_two_level_dispatch_interpret(mxu, monkeypatch):
    """The whole TPU trace path — octant/morton sort, cluster shortlists,
    streaming kernel, unsort, overflow fallback wiring — executed end to end
    under interpret mode (normally unreachable on CPU behind
    platform_dependent), vs the brute oracle, in both pair-math branches."""
    # The dispatch's internal call sites resolve these env vars per call
    # (outside any jit), and interpret/mxu are static cache keys — so this
    # composes with traces cached by earlier tests.
    monkeypatch.setenv("NR_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("NR_TRACE_MXU", "1" if mxu else "0")

    mesh = outward_sphere(48, 96, 1.0).to_arrays()  # 9216 tris, 36 clusters
    o, d = _rays(2048, seed=19)
    for mode in (traversal.ANY, traversal.FORWARD_ONLY):
        got = traversal._trace_two_level(mesh, o, d, mode, None)
        ref = traversal.trace_mesh_brute(mesh, o, d, mode)
        hit = np.asarray(got.hit)
        want = np.asarray(ref.hit)
        assert (hit != want).mean() < 2e-3, mode
        both = hit & want
        assert both.sum() > 600
        np.testing.assert_allclose(np.asarray(got.t)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-5, atol=1e-6)
        assert (np.asarray(got.tri)[both]
                == np.asarray(ref.tri)[both]).mean() > 0.99


def test_vpu_dense_kernel_interpret_matches_brute():
    """Symmetric coverage for the original VPU dense kernel body (its XLA
    twin was CPU-tested; the kernel itself was not)."""
    from neural_renderer_tpu.ops.trace_pallas import (BLOCK_RAYS, TRI_TILE,
                                                      trace_dense_pallas)
    mesh = outward_sphere(8, 16, 1.0).to_arrays()
    tp = mesh.tris_packed
    t_pad = -(-tp.shape[1] // TRI_TILE) * TRI_TILE
    tp = jnp.pad(tp, ((0, 0), (0, t_pad - tp.shape[1])))
    o, d = _rays(BLOCK_RAYS * 2, seed=23)
    for mode in (traversal.ANY, traversal.BACKWARD_ONLY):
        bt, tri = trace_dense_pallas(o, d, tp, mode, t_pad // TRI_TILE,
                                     interpret=True)
        ref = traversal.trace_mesh_brute(mesh, o, d, mode)
        hit = np.asarray(bt) < 1e30
        want = np.asarray(ref.hit)
        assert (hit != want).mean() < 2e-3, mode
        both = hit & want
        assert both.sum() > 200
        np.testing.assert_allclose(np.asarray(bt)[both],
                                   np.asarray(ref.t)[both],
                                   rtol=1e-6, atol=1e-6)
        assert (np.asarray(tri)[both]
                == np.asarray(ref.tri)[both]).mean() > 0.999


def test_padding_triangles_never_hit():
    mesh = outward_sphere(6, 12, 1.0).to_arrays()
    o, d = _rays(256, seed=3)
    tp = jnp.pad(mesh.tris_packed, ((0, 0), (0, 37)))  # zero padding tris
    best_t, _ = trace_dense_mxu_xla(o, d, tp, traversal.ANY)
    ref = traversal.trace_mesh_brute(mesh, o, d, traversal.ANY)
    hit = np.asarray(best_t) < 1e30
    assert (hit != np.asarray(ref.hit)).mean() < 2e-3

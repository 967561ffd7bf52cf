"""Knot-scene fixtures (scripts/make_knot_scene.py): watertight tube
geometry, and the multi-segment shell march on NON-convex shells — rays
cross a trefoil-knot tube's outer shell several times, so re-entry handling
(prepareNextIterationKernel semantics, cuda_renderer_neural.cu:1456-1524)
is exercised beyond the single-segment sphere fixtures."""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from make_knot_scene import knot_centerline, min_strand_separation, tube_mesh

from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.ops import traversal
from neural_renderer_tpu.render.neural_march import (
    NeuralContext, trace_neural_segments)
from neural_renderer_tpu.render.params import RenderParams
from neural_renderer_tpu.scene.materials import Material
from neural_renderer_tpu.scene.mesh import Mesh

from util import crafted_net_params


def knot_mesh(n_center, radius, k) -> Mesh:
    v, nrm, idx = tube_mesh(knot_centerline(n_center), radius, k)
    m = Mesh()
    m.vertices = v.astype(np.float32)
    m.normals = nrm.astype(np.float32)
    m.indices = idx.astype(np.uint32)
    m.mark_dirty()
    return m


def test_tube_mesh_watertight_and_outward():
    v, nrm, idx = tube_mesh(knot_centerline(96), 0.3, 12)
    assert idx.shape == (2 * 96 * 12, 3)

    # Manifold: every directed edge appears exactly once, and its reverse
    # exactly once (each undirected edge shared by 2 consistently-wound tris).
    edges = set()
    for a, b, c in idx:
        for e in ((a, b), (b, c), (c, a)):
            assert e not in edges, f"duplicate directed edge {e}"
            edges.add(e)
    for a, b in edges:
        assert (b, a) in edges, f"boundary edge {(a, b)}"

    # Outward winding: divergence-theorem volume is positive and close to
    # the smooth tube's pi r^2 L (centerline length ~31.9 -> V ~ 9.0; the
    # polygonal tube is inscribed, so slightly smaller).
    t = v[idx]
    vol = np.einsum("ij,ij->i", t[:, 0], np.cross(t[:, 1], t[:, 2])).sum() / 6
    smooth = np.pi * 0.3 ** 2 * 31.9
    assert 0.8 * smooth < vol < 1.02 * smooth

    # Vertex normals agree with geometric normals.
    gn = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
    gn /= np.linalg.norm(gn, axis=1, keepdims=True)
    cosang = np.einsum("ij,ij->i", gn, nrm[idx[:, 0]])
    assert cosang.min() > 0.2 and cosang.mean() > 0.9


def test_strand_separation_guard():
    sep = min_strand_separation(knot_centerline(256), skip=256 // 20)
    assert 1.0 < sep < 1.3  # trefoil: ~1.16


def _camera_rays(w, h, fov=0.9, cam=(0.0, 0.0, 7.0)):
    xs = (np.arange(w) + 0.5) / w * 2 - 1
    ys = (np.arange(h) + 0.5) / h * 2 - 1
    gx, gy = np.meshgrid(xs, ys)
    tanf = np.tan(fov / 2)
    d = np.stack([gx * tanf * w / h, -gy * tanf, -np.ones_like(gx)], 0)
    d = d.reshape(3, -1)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o = np.broadcast_to(np.asarray(cam, np.float32)[:, None], d.shape)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


def test_knot_march_multisegment_inner_forcing():
    """With an always-miss network, a march hit can only come from
    inner-shell forcing (applySegmentNeuralOutputKernel :1055-1063) in SOME
    segment — so the hit mask must equal the brute-force inner-shell ANY
    test, including rays whose inner hit is on the second or third strand
    crossing (pure multi-segment re-entry on a non-convex outer shell)."""
    inner = knot_mesh(96, 0.22, 12).to_arrays()
    outer = knot_mesh(96, 0.50, 12).to_arrays()
    cfg = nbvh.NbvhConfig(log2_hashmap_size=10, base_resolution=8, n_levels=2,
                          mlp_width=32, mlp_hidden_layers=2)
    net = crafted_net_params(cfg, presence=-1.0)
    ctx = NeuralContext(outer=outer, inner=inner, net_params=net, config=cfg)
    omin = np.asarray(outer.bvh_bounds_min[:, 0])
    omax = np.asarray(outer.bvh_bounds_max[:, 0])
    params = RenderParams.make(
        width=48, height=32, samples_per_pixel=1, max_bounces=1,
        cam_pos=[0, 0, 7.0], cam_forward=[0, 0, -1.0], cam_right=[1, 0, 0.0],
        cam_up=[0, 1, 0.0], fov_y=0.9, material=Material.default(),
        scene_scale=7.0, outer_shell_min=omin,
        outer_shell_inv_extent=1.0 / (omax - omin))

    o, d = _camera_rays(48, 32)
    ref = traversal.trace_mesh_brute(inner, o, d, traversal.ANY)

    for mode in ("fwd2", "trace"):
        out = jax.jit(lambda m: trace_neural_segments(
            ctx, params, o, d, compute_dtype=jnp.float32, camera_entry=m),
            static_argnums=0)(mode)
        hit = np.asarray(out.hit)
        want = np.asarray(ref.hit)
        # FP-grazing strand silhouettes may flip either way; require
        # near-perfect agreement.
        assert (hit != want).mean() < 0.005, mode
        assert want.sum() > 100  # the knot actually fills the frame

    # Multi-segment evidence: some hit positions lie beyond the FIRST
    # outer-shell exit along the ray, i.e. the hit was found on a later
    # strand crossing after a re-entry.
    sw = traversal.sweep_shells(outer, inner, o, d)
    first_exit = np.asarray(sw.outer_bwd)
    t_hit = np.einsum("ij,ij->j", np.asarray(out.position) - np.asarray(o),
                      np.asarray(d))
    later = np.asarray(out.hit) & (t_hit > first_exit + 1e-3)
    assert later.sum() >= 15  # measured 20 at 48x32 on this fixture

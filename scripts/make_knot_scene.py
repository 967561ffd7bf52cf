"""Generate the second bundled example scene: a shelled trefoil-knot tube.

The sphere scene (make_example_scene.py) is geometrically trivial — convex
shells, one march segment per ray, every mesh under the dense-kernel limit.
This scene is the stress configuration the reference's dbrt_data assets
would provide (they are absent from the snapshot, SURVEY.md caveats):

  * ~65k-triangle original mesh  -> two-level clustered streaming trace
  * non-convex, self-occluding shells -> rays cross the outer shell up to 6
    times, so the multi-segment march (cuda_renderer_neural.cu:1810-2083)
    genuinely iterates and re-entry handling is exercised
  * ~18k combined shell triangles -> clustered shell sweeps

Geometry: a (2,3) torus knot centerline with parallel-transport frames
(closure twist distributed around the loop so the tube is watertight),
triangulated as an M x K grid; inner/outer shells share the centerline with
smaller/larger tube radii. Normals are exact (radial from the centerline).

Usage: python scripts/make_knot_scene.py [out_dir=configs/knot]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_renderer_tpu.config import camera_state_to_matrix


def knot_centerline(n: int, p: int = 2, q: int = 3) -> np.ndarray:
    """(p,q) torus-knot points [n, 3]; standard trefoil for (2,3)."""
    t = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    r = 2.0 + np.cos(q * t)
    return np.stack([r * np.cos(p * t), r * np.sin(p * t),
                     -np.sin(q * t)], axis=1)


def min_strand_separation(points: np.ndarray, skip: int) -> float:
    """Smallest distance between non-neighbouring centerline points — the
    bound on tube radius before the knot self-intersects (2r < sep)."""
    n = len(points)
    d = np.linalg.norm(points[:, None, :] - points[None, :, :], axis=-1)
    idx = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    ring = np.minimum(idx, n - idx)
    return float(d[ring > skip].min())


def _normalize(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def tube_mesh(points: np.ndarray, radius: float, k: int):
    """Watertight tube of `radius` around the closed polyline `points`
    ([M, 3]): parallel-transport frames with the closure twist spread evenly,
    M*K vertices, 2*M*K triangles wound outward, exact radial normals.
    Returns (vertices, normals, indices)."""
    m = len(points)
    tangents = _normalize(np.roll(points, -1, axis=0) -
                          np.roll(points, 1, axis=0))

    # Parallel transport an initial normal along the loop.
    seed = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(seed, tangents[0])) > 0.9:
        seed = np.array([1.0, 0.0, 0.0])
    frames_n = np.empty_like(points)
    frames_n[0] = _normalize(seed - np.dot(seed, tangents[0]) * tangents[0])
    for i in range(1, m):
        v = frames_n[i - 1]
        v = v - np.dot(v, tangents[i]) * tangents[i]
        frames_n[i] = _normalize(v)
    frames_b = np.cross(tangents, frames_n)

    # Closing the loop leaves a residual rotation between frame M-1
    # transported onward and frame 0; distribute it so ring M-1 stitches to
    # ring 0 without a seam.
    v = frames_n[m - 1] - np.dot(frames_n[m - 1], tangents[0]) * tangents[0]
    v = _normalize(v)
    twist = np.arctan2(np.dot(np.cross(v, frames_n[0]), tangents[0]),
                       np.dot(v, frames_n[0]))
    corr = twist * np.arange(m) / m
    cn, sn = np.cos(corr)[:, None], np.sin(corr)[:, None]
    frames_n, frames_b = (cn * frames_n + sn * frames_b,
                          -sn * frames_n + cn * frames_b)

    theta = 2.0 * np.pi * np.arange(k) / k
    ct, st = np.cos(theta), np.sin(theta)
    radial = (frames_n[:, None, :] * ct[None, :, None] +
              frames_b[:, None, :] * st[None, :, None])    # [M, K, 3]
    vertices = (points[:, None, :] + radius * radial).reshape(-1, 3)
    normals = radial.reshape(-1, 3)

    ii, jj = np.meshgrid(np.arange(m), np.arange(k), indexing="ij")
    a = (ii * k + jj).ravel()
    b = (((ii + 1) % m) * k + jj).ravel()
    c = (((ii + 1) % m) * k + (jj + 1) % k).ravel()
    d = (ii * k + (jj + 1) % k).ravel()
    indices = np.concatenate([np.stack([a, b, c], 1),
                              np.stack([a, c, d], 1)]).astype(np.int32)

    # Orient outward: flip if the first triangle's geometric normal points
    # against its radial direction.
    t0 = vertices[indices[0]]
    gn = np.cross(t0[1] - t0[0], t0[2] - t0[0])
    if np.dot(gn, normals[indices[0, 0]]) < 0:
        indices = indices[:, [0, 2, 1]].copy()
    return vertices, normals, indices


def write_obj(path: str, vertices, normals, indices):
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for n in normals:
            f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for a, b, c in indices.astype(int) + 1:
            f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "configs/knot"
    os.makedirs(out, exist_ok=True)

    r_orig, r_inner, r_outer = 0.35, 0.22, 0.50
    center_fine = knot_centerline(512)
    # Exclude 5% of the loop on each side so the scan measures strand-to-
    # strand distance, not the local chord (trefoil: sep 1.14, min radius of
    # curvature 1.43 — both leave r_outer=0.5 a wide margin).
    sep = min_strand_separation(center_fine, skip=len(center_fine) // 20)
    assert 2.0 * r_outer < sep, (
        f"outer tube self-intersects: 2*{r_outer} >= strand sep {sep:.3f}")

    write_obj(os.path.join(out, "original.obj"),
              *tube_mesh(center_fine, r_orig, 64))         # 65,536 tris
    center_shell = knot_centerline(192)
    write_obj(os.path.join(out, "inner.obj"),
              *tube_mesh(center_shell, r_inner, 24))       # 9,216 tris
    write_obj(os.path.join(out, "outer.obj"),
              *tube_mesh(center_shell, r_outer, 24))       # 9,216 tris

    matrix = camera_state_to_matrix(np.array([0.0, 0.0, 7.0]), -90.0, 0.0)
    base = {
        "scene": {
            "original_mesh": {"path": "original.obj"},
            "inner_shell": {"path": "inner.obj"},
            "outer_shell": {"path": "outer.obj"},
        },
        "environment": {"hdri_path": "", "rotation": 0.0, "strength": 1.0},
        "camera": {"matrix": [float(v) for v in matrix], "yfov": 0.9},
        "rendering": {"total_samples": 64, "bounce_count": 3,
                      "width": 480, "height": 270},
        "material": {"base_color": [0.85, 0.55, 0.25], "roughness": 0.45,
                     "metallic": 0.0, "specular": 0.4},
    }
    tcnn = dict(base, checkpoint_path="weights.bin",
                neural_network={"log2_hashmap_size": 14,
                                "base_resolution": 16,
                                "use_neural_query": True})
    lane = dict(base, checkpoint_path="lane_ckpt",
                neural_network={"log2_hashmap_size": 14,
                                "base_resolution": 16,
                                "use_neural_query": True,
                                "grid_type": "lane",
                                "lane_sublanes": 16,
                                "lane_entry_pack": 2})
    with open(os.path.join(out, "knot.json"), "w") as f:
        json.dump(tcnn, f, indent=2)
    with open(os.path.join(out, "knot_lane.json"), "w") as f:
        json.dump(lane, f, indent=2)
    print(f"wrote knot scene to {out}/ (sep={sep:.3f})")


if __name__ == "__main__":
    main()

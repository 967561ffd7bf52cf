"""Training data: shell segments with ground-truth mesh intersections.

The reference's C++ runtime is inference-only — training happened offline in
a PyTorch script that is not in the snapshot (SURVEY.md caveats;
PROJECT.md:152). This module provides the online sampler: random rays through
the shell volume are marched exactly like the renderer
(traceNeuralSegmentsForRays semantics), and the ORIGINAL mesh supplies the
supervision: presence, distance-from-entry, normal and albedo per segment.
The network's job is to answer those queries, so the generator mirrors the
inference-time input construction bit-for-bit (shifted entry, exit = min of
outer exit / inner enter, midpoint, direction in [0,1]).

All vectors are channel-major ([3, B]; network inputs [12, B]).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import traversal
from ..ops.intersect import compute_hit_data, resolve_material
from ..ops.linalg import where3
from ..render.neural_march import SEGMENT_EPSILON


class SegmentBatch(NamedTuple):
    inputs: jnp.ndarray    # [12, B] network inputs (normalized)
    presence: jnp.ndarray  # [B] float 0/1
    distance: jnp.ndarray  # [B] distance from shifted entry (valid if presence)
    normal: jnp.ndarray    # [3, B] GT shading normal (valid if presence)
    color: jnp.ndarray     # [3, B] GT albedo (valid if presence)
    valid: jnp.ndarray     # [B] segment exists (ray crossed the outer shell)


def sample_segment_batch(key, gt_mesh, outer, inner, outer_min, outer_inv_extent,
                         batch_size: int, radius: float,
                         segments_per_ray: int = 1,
                         global_row=None) -> SegmentBatch:
    """Generate one batch of supervised shell segments.

    Rays: origins uniform on a sphere of `radius` around the shell, directions
    toward uniform points in the outer bbox (so most rays cross the shell).
    outer_min / outer_inv_extent: [3] f32.

    segments_per_ray > 1 marches each ray through re-entries exactly like
    inference (prepareNextIterationKernel semantics) and emits every segment
    as a training row. First crossings alone cannot cover non-convex shells:
    strand-facing regions of e.g. the knot scene's outer tube are never the
    FIRST forward crossing from outside, yet inference queries those
    segments after a re-entry — without this they would be out of the
    training distribution entirely. Rows from exhausted rays are masked
    invalid (losses already weight by `valid`); convex shells simply get
    all-invalid later blocks. Total rows == batch_size.
    """
    s = max(1, int(segments_per_ray))
    rays = -(-batch_size // s)
    k1, k2 = jax.random.split(key)
    o = jax.random.normal(k1, (3, rays), jnp.float32)
    o = o / jnp.linalg.norm(o, axis=0, keepdims=True) * radius
    u = jax.random.uniform(k2, (3, rays), jnp.float32)
    target = outer_min[:, None] + u / jnp.maximum(outer_inv_extent[:, None], 1e-12)
    d = target - o
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)

    if global_row is None:
        # Callers SHOULD pass the scene's global-material row (the renderer
        # resolves material_id < 0 hits against params.material_row, which
        # carries the config's MaterialConfig — the color supervision must
        # match it or untextured meshes train to the wrong albedo).
        from ..scene.materials import Material
        import numpy as _np
        global_row = jnp.asarray(_np.asarray(Material.default().scalar_row()))
    omin = outer_min[:, None]
    inv = outer_inv_extent[:, None]
    zero3 = jnp.zeros((3, rays), jnp.float32)

    # Shell entry (camera-style FORWARD_ONLY).
    res_entry = traversal.trace_mesh(outer, o, d, traversal.FORWARD_ONLY)
    valid = res_entry.hit
    entry_pos = o + d * res_entry.t[None, :]

    rows = []
    for it in range(s):
        shifted_entry = entry_pos + d * SEGMENT_EPSILON

        # Segment exit: min(outer BACKWARD, inner ANY) from the shifted entry.
        res_exit = traversal.trace_mesh(outer, shifted_entry, d,
                                        traversal.BACKWARD_ONLY, active=valid)
        exit_t = jnp.where(res_exit.hit, res_exit.t, SEGMENT_EPSILON)
        res_inner = traversal.trace_mesh(inner, shifted_entry, d,
                                         traversal.ANY, active=valid)
        inner_t = jnp.where(res_inner.hit, res_inner.t, 1e30)
        seg_t = jnp.where(res_inner.hit & (inner_t < exit_t), inner_t, exit_t)
        exit_pos = shifted_entry + d * seg_t[None, :]

        # Ground truth: closest original-mesh hit from the shifted entry,
        # counted as "inside the segment" if it lands before the segment end.
        res_gt = traversal.trace_mesh(gt_mesh, shifted_entry, d,
                                      traversal.ANY, active=valid)
        inside = res_gt.hit & (res_gt.t <= seg_t + SEGMENT_EPSILON)
        presence = (valid & inside).astype(jnp.float32)

        hd = compute_hit_data(gt_mesh, shifted_entry, d, res_gt.tri, res_gt.u,
                              res_gt.v, res_gt.t)
        rm = resolve_material(gt_mesh, hd.material_id, hd.uv, global_row)

        # Network inputs, identical to buildSegmentNeuralInputsKernel.
        norm_entry = (shifted_entry - omin) * inv
        norm_exit = (exit_pos - omin) * inv
        mid = 0.5 * (shifted_entry + exit_pos)
        norm_mid = (mid - omin) * inv
        dir01 = (d + 1.0) * 0.5
        rows.append(SegmentBatch(
            inputs=jnp.concatenate([norm_entry, norm_exit, norm_mid, dir01],
                                   axis=0),
            presence=presence,
            distance=jnp.where(inside, res_gt.t, 0.0),
            normal=where3(inside, hd.shading_normal, zero3),
            color=where3(inside, rm.base_color, zero3),
            valid=valid,
        ))

        if it + 1 < s:
            # Advance to the next segment through the re-entry, exactly like
            # the march (prepareNextIterationKernel): FORWARD trace from the
            # epsilon-shifted exit.
            shifted_exit = exit_pos + d * SEGMENT_EPSILON
            res_re = traversal.trace_mesh(outer, shifted_exit, d,
                                          traversal.FORWARD_ONLY, active=valid)
            valid = valid & res_re.hit
            entry_pos = shifted_exit + d * res_re.t[None, :]

    if s == 1:
        return rows[0]
    cat = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=-1), *rows)
    return jax.tree_util.tree_map(lambda x: x[..., :batch_size], cat)

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
                         global_row=None, sweep: bool = True) -> SegmentBatch:
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

    sweep=True (default): per segment, ONE fused dual-mesh dual-facing
    shell sweep replaces the outer-BACKWARD + inner-ANY + re-entry-FORWARD
    traces — crossings of a closed surface alternate along the ray, so from
    the shifted entry the first backward outer crossing is the exit and the
    first forward one the re-entry (the same derivation the camera march
    fast path uses, BASELINE.md). sweep=False keeps the four literal traces
    (the reference-shaped oracle; parity-tested in tests/test_train.py).
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

    # Sort rays into octant/morton-coherent order ONCE (batch row order is
    # irrelevant to the loss): the clustered trace/sweep kernels then work
    # on tight frusta, and every trace_mesh call skips its own argsort +
    # permutes (presorted=True) — otherwise each of them re-sorts the batch.
    order = traversal._ray_sort_order(o, d, None)
    od = jnp.take(jnp.concatenate([o, d], axis=0), order, axis=1)
    o, d = od[0:3], od[3:6]

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

    if sweep:
        # Entry + segment-0 exits + (s>1) re-entry from ONE sweep at the
        # origin: rays start outside the shell, so the first backward outer
        # crossing is segment 0's exit and every inner crossing lies beyond
        # the entry; the second forward crossing is the first re-entry.
        sw0 = traversal.sweep_shells(outer, inner, o, d, with_fwd2=(s > 1))
        valid = sw0.outer_fwd < 1e30
        entry_t0 = jnp.where(valid, sw0.outer_fwd, 0.0)
        entry_pos = o + d * entry_t0[None, :]
        entry_abs = entry_t0
    else:
        # Shell entry (camera-style FORWARD_ONLY).
        res_entry = traversal.trace_mesh(outer, o, d, traversal.FORWARD_ONLY)
        valid = res_entry.hit
        entry_pos = o + d * res_entry.t[None, :]

    rows = []
    re_t = None
    for it in range(s):
        shifted_entry = entry_pos + d * SEGMENT_EPSILON

        if sweep and it == 0:
            base = entry_t0 + SEGMENT_EPSILON
            inner_abs = jnp.minimum(sw0.inner_fwd, sw0.inner_bwd)
            inner_hit = inner_abs < 1e30
            inner_t = jnp.where(inner_hit,
                                jnp.maximum(inner_abs - base, 0.0), 1e30)
            exit_t = jnp.where(sw0.outer_bwd < 1e30,
                               jnp.maximum(sw0.outer_bwd - base, 0.0),
                               SEGMENT_EPSILON)
            re_t = jnp.where(sw0.outer_fwd2 < 1e30,
                             sw0.outer_fwd2 - base, 1e30)
            # GT from the SHIFTED entry (exactly the oracle's trace): a GT
            # surface poking outside the coarse outer shell would otherwise
            # be clamped to t=0 with presence=1 and a stale normal.
            res_gt0 = traversal.trace_mesh(gt_mesh, shifted_entry, d,
                                           traversal.ANY, active=valid,
                                           presorted=True)
            gt_abs = jnp.where(res_gt0.hit, base + res_gt0.t, 1e30)
            gt_hit_c = res_gt0.hit
            gt_tri_c, gt_u_c, gt_v_c = res_gt0.tri, res_gt0.u, res_gt0.v
            gt_hit = gt_hit_c
            gt_t = jnp.maximum(gt_abs - base, 0.0)
            gt_tri, gt_u, gt_v = gt_tri_c, gt_u_c, gt_v_c
        elif sweep:
            # ONE fused sweep: exit (first outer BACKWARD), inner ANY
            # (min of both facings), and the next re-entry (first outer
            # FORWARD — alternation puts it beyond the exit).
            sw = traversal.sweep_shells(outer, inner, shifted_entry, d)
            inner_t = jnp.minimum(sw.inner_fwd, sw.inner_bwd)
            inner_hit = inner_t < 1e30
            exit_t = jnp.where(sw.outer_bwd < 1e30, sw.outer_bwd,
                               SEGMENT_EPSILON)
            re_t = sw.outer_fwd  # relative to shifted_entry; used below
            base = entry_abs + SEGMENT_EPSILON
            # Conditional GT re-trace: rays whose carried hit was consumed
            # (set below when the previous row was built), plus rays whose
            # carried hit now lies BEFORE the new entry. The carry argument
            # (an unconsumed hit is still the first beyond the next entry)
            # holds only when the GT surface is strictly inside the shell
            # volume; generated shells are coarse and that invariant is not
            # guaranteed, and clamping a stale hit to t=0 would emit
            # presence=1 rows with zeroed distance and a stale normal.
            stale = gt_hit_c & (gt_abs < base - SEGMENT_EPSILON)
            refresh = gt_consumed | stale
            res_gt = traversal.trace_mesh(gt_mesh, shifted_entry, d,
                                          traversal.ANY,
                                          active=valid & refresh,
                                          presorted=True)
            gt_abs = jnp.where(refresh,
                               jnp.where(res_gt.hit, base + res_gt.t, 1e30),
                               gt_abs)
            gt_hit_c = jnp.where(refresh, res_gt.hit, gt_hit_c)
            gt_tri_c = jnp.where(refresh, res_gt.tri, gt_tri_c)
            gt_u_c = jnp.where(refresh, res_gt.u, gt_u_c)
            gt_v_c = jnp.where(refresh, res_gt.v, gt_v_c)
            gt_hit = gt_hit_c
            gt_t = jnp.maximum(gt_abs - base, 0.0)
            gt_tri, gt_u, gt_v = gt_tri_c, gt_u_c, gt_v_c
        else:
            # Segment exit: min(outer BACKWARD, inner ANY), literal traces.
            res_exit = traversal.trace_mesh(outer, shifted_entry, d,
                                            traversal.BACKWARD_ONLY,
                                            active=valid)
            exit_t = jnp.where(res_exit.hit, res_exit.t, SEGMENT_EPSILON)
            res_inner = traversal.trace_mesh(inner, shifted_entry, d,
                                             traversal.ANY, active=valid)
            inner_hit = res_inner.hit
            inner_t = jnp.where(res_inner.hit, res_inner.t, 1e30)
            res_gt = traversal.trace_mesh(gt_mesh, shifted_entry, d,
                                          traversal.ANY, active=valid,
                                          presorted=True)
            gt_hit, gt_t = res_gt.hit, res_gt.t
            gt_tri, gt_u, gt_v = res_gt.tri, res_gt.u, res_gt.v
        seg_t = jnp.where(inner_hit & (inner_t < exit_t), inner_t, exit_t)
        exit_pos = shifted_entry + d * seg_t[None, :]

        # Ground truth: closest original-mesh hit from the shifted entry,
        # counted as "inside the segment" if it lands before the segment end.
        inside = gt_hit & (gt_t <= seg_t + SEGMENT_EPSILON)
        presence = (valid & inside).astype(jnp.float32)
        if sweep:
            gt_consumed = inside  # next segment must look past this hit

        hd = compute_hit_data(gt_mesh, shifted_entry, d, gt_tri, gt_u,
                              gt_v, gt_t)
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
            distance=jnp.where(inside, gt_t, 0.0),
            normal=where3(inside, hd.shading_normal, zero3),
            color=where3(inside, rm.base_color, zero3),
            valid=valid,
        ))

        if it + 1 < s:
            # Advance to the next segment through the re-entry
            # (prepareNextIterationKernel): the first FORWARD outer crossing
            # beyond the epsilon-shifted exit.
            if sweep:
                # Derived from the sweep: alternation places the first
                # forward crossing (from the shifted entry) beyond the exit;
                # require it to clear the shifted exit like the trace does.
                hit_re = re_t > seg_t + SEGMENT_EPSILON
                valid = valid & (re_t < 1e30) & hit_re
                entry_pos = shifted_entry + d * re_t[None, :]
                entry_abs = entry_abs + SEGMENT_EPSILON + re_t
            else:
                shifted_exit = exit_pos + d * SEGMENT_EPSILON
                res_re = traversal.trace_mesh(outer, shifted_exit, d,
                                              traversal.FORWARD_ONLY,
                                              active=valid)
                valid = valid & res_re.hit
                entry_pos = shifted_exit + d * res_re.t[None, :]

    if s == 1:
        return rows[0]
    cat = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=-1), *rows)
    return jax.tree_util.tree_map(lambda x: x[..., :batch_size], cat)

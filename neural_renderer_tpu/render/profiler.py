"""Stage-timing harness: the PROFILE_KERNELS equivalent.

The reference wraps every major dispatch in cudaEvent pairs and aggregates 13
KernelId categories into per-frame ms / ns-per-ray / Mrays
(cuda_renderer_neural.h:17-66, viewer.cu:520-590). Here the production frame
is ONE fused XLA program, so per-stage attribution requires running the
stages as separately-jitted programs. Timing pipelines several async
dispatches behind one scalar-readback barrier and subtracts the platform's
fixed round-trip floor (~40 ms on remote axon — see _rpc_floor_ms). The
category totals still slightly exceed the fused frame time (materialized
intermediates); use `frame_total` for end-to-end numbers and the categories
for relative attribution. For instruction-level detail use
jax.profiler.trace(...) around Renderer.render().
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import traversal
from . import pathtrace as pt
from .neural_march import bounce_shell_entry_and_early_term, \
    trace_neural_segments

# The reference's 13 KernelId categories (cuda_renderer_neural.h:17-35).
CATEGORIES = (
    "primaryTrace", "shellTrace", "neuralForward", "initPathState",
    "sampleBounce", "earlyTermination", "bounceTrace",
    "additionalMeshPrimary", "additionalMeshBounce", "selectClosestPrimary",
    "selectClosestBounce", "integrateBounce", "finalize",
)


@dataclass
class KernelTimings:
    """Mirror of the reference's KernelTimings (cuda_renderer_neural.h:37-66)."""
    ms: dict = field(default_factory=lambda: {k: 0.0 for k in CATEGORIES})
    ray_count: int = 0
    neural_ray_calls: int = 0
    frame_total_ms: float = 0.0

    def ns_per_ray(self, category: str) -> float:
        if self.ray_count == 0:
            return 0.0
        return self.ms[category] * 1e6 / self.ray_count

    @property
    def mrays(self) -> float:
        return self.ray_count / 1e6

    @property
    def neural_calls_per_ray(self) -> float:
        return self.neural_ray_calls / max(1, self.ray_count)

    def table(self) -> str:
        lines = [f"{'category':24s} {'ms':>9s} {'ns/ray':>9s}"]
        for k in CATEGORIES:
            if self.ms[k] > 0:
                lines.append(f"{k:24s} {self.ms[k]:9.3f} {self.ns_per_ray(k):9.2f}")
        lines.append(f"{'frame total':24s} {self.frame_total_ms:9.3f} "
                     f"{self.frame_total_ms * 1e6 / max(1, self.ray_count):9.2f}")
        lines.append(f"rays/frame: {self.mrays:.2f} M   "
                     f"avg neural calls/ray: {self.neural_calls_per_ray:.2f}")
        return "\n".join(lines)


def _sync(out):
    """Scalar-readback barrier (block_until_ready is unreliable on the
    remote 'axon' platform; a bulk transfer would time the tunnel)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


_rpc_floor_cache = [None]


def _rpc_floor_ms() -> float:
    """Fixed cost of one dispatch + scalar readback round trip (~40 ms on
    the remote axon platform, ~0 locally). Every timed region pays it once
    (the final barrier); subtract it or per-stage numbers are inflated by
    +floor/runs — at runs=2 that once mis-attributed ~20 ms to every
    category (see BASELINE.md round 2, 'RPC floor')."""
    if _rpc_floor_cache[0] is None:
        x = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda x: jnp.sum(x * 2.0))
        float(f(x))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            samples.append(time.perf_counter() - t0)
        _rpc_floor_cache[0] = min(samples) * 1e3
    return _rpc_floor_cache[0]


def _timed(fn, *args, runs=8):
    """Time fn over `runs` asynchronously-pipelined dispatches with ONE
    final barrier, minus the round-trip floor."""
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    _sync(out)
    elapsed = (time.perf_counter() - t0) * 1e3
    # Never report zero: a stage faster than the round-trip floor is
    # floor-dominated; keep 5% of raw as a visible lower bound.
    ms = max(elapsed - _rpc_floor_ms(), 0.05 * elapsed) / runs
    return out, ms


def profile_renderer(renderer, cam_pos, neural: bool) -> KernelTimings:
    """Stage-profile a Renderer's current scene/settings — the ONE home for
    the harness the viewer's 't' binding and `evaluate --profile` share."""
    from .neural_march import NeuralContext
    params = renderer._build_params(cam_pos)
    env = renderer._env_arrays()
    if neural and renderer.scene.outer_shell.num_triangles:
        ctx = NeuralContext(outer=renderer._mesh_arrays("outer_shell"),
                            inner=renderer._mesh_arrays("inner_shell"),
                            net_params=renderer.net_params,
                            config=renderer.net_config)
        return profile_neural_frame(
            ctx, renderer._mesh_arrays("additional_mesh"), env, params)
    return profile_gt_frame(renderer._classic_mesh(), env, params)


def profile_gt_frame(mesh, env, params, accum=None, runs=2) -> KernelTimings:
    """Per-stage timings for the GT branch."""
    t = KernelTimings()
    t.ray_count = params.pixel_count * params.samples_per_pixel
    if accum is None:
        accum = jnp.zeros((3, params.pixel_count), jnp.float32)

    prim = jax.jit(lambda p: pt.primary_rays(p))
    (pixel_idx, sample_of, _, origins, dirs), _ = _timed(prim, params, runs=runs)

    hits, ms = _timed(jax.jit(pt.trace_primary_gt), mesh, params, origins, dirs,
                      runs=runs)
    t.ms["primaryTrace"] = ms

    path, ms = _timed(jax.jit(pt.init_path_state), params, env, hits, dirs,
                      runs=runs)
    t.ms["initPathState"] = ms

    incoming = None
    cur_hits = hits
    for bounce in range(1, params.max_bounces + 1):
        sample = jax.jit(lambda p, pi, so, h, a, inc: pt.sample_bounce_directions(
            p, pi, so, h, a, inc))
        rays, ms = _timed(sample, params, pixel_idx, sample_of, cur_hits,
                          path.active, incoming, runs=runs)
        t.ms["sampleBounce"] += ms
        path = pt.update_active_after_sampling(path, cur_hits, rays)

        bh, ms = _timed(jax.jit(pt.trace_bounces_gt), mesh, params, rays,
                        runs=runs)
        t.ms["bounceTrace"] += ms

        integrate = jax.jit(lambda p, e, pa, b, r, pi, so, bi=bounce:
                            pt.integrate_bounce(p, e, pa, b, r, bi, pi, so))
        path, ms = _timed(integrate, params, env, path, bh, rays, pixel_idx,
                          sample_of, runs=runs)
        t.ms["integrateBounce"] += ms
        incoming = rays.direction
        cur_hits = bh

    (_, _), ms = _timed(jax.jit(pt.finalize), params, path.radiance, accum,
                        runs=runs)
    t.ms["finalize"] = ms

    # End-to-end fused frame for the headline number.
    frame = jax.jit(pt.render_gt_frame)
    _, t.frame_total_ms = _timed(frame, mesh, env, params, accum, runs=runs)
    return t


def profile_neural_frame(ctx, additional_mesh, env, params, accum=None,
                         use_additional=False, compute_dtype=jnp.bfloat16,
                         runs=2) -> KernelTimings:
    """Per-stage timings for the neural branch. The shell march (shellTrace +
    neuralForward) is one fused while_loop; it is reported under shellTrace
    with a separate neuralForward estimate from a standalone network call at
    the march's ray count."""
    from ..models import nbvh
    from .neural_frame import render_neural_frame

    t = KernelTimings()
    n = params.pixel_count * params.samples_per_pixel
    t.ray_count = n
    if accum is None:
        accum = jnp.zeros((3, params.pixel_count), jnp.float32)

    prim = jax.jit(lambda p: pt.primary_rays(p))
    (pixel_idx, sample_of, _, origins, dirs), _ = _timed(prim, params, runs=runs)

    march = jax.jit(lambda c, p, o, d: trace_neural_segments(
        c, p, o, d, camera_rays=True, compute_dtype=compute_dtype))
    hits, ms = _timed(march, ctx, params, origins, dirs, runs=runs)
    t.ms["shellTrace"] = ms

    # Standalone network forward at the full ray batch == one march iteration
    # worth of MLP work.
    net_in = jnp.zeros((ctx.config.input_dims, n), jnp.float32)
    fwd = jax.jit(lambda p, x: nbvh.apply(p, x, ctx.config,
                                          compute_dtype=compute_dtype,
                                          use_kernel=True))
    _, ms = _timed(fwd, ctx.net_params, net_in, runs=runs)
    t.ms["neuralForward"] = ms
    t.neural_ray_calls = n  # one march iteration per ray, lower bound

    if use_additional and not additional_mesh.is_empty:
        add = jax.jit(lambda m, p, o, d: pt.trace_rays_mesh(
            m, p, o, d, traversal.FORWARD_ONLY))
        add_hits, ms = _timed(add, additional_mesh, params, origins, dirs,
                              runs=runs)
        t.ms["additionalMeshPrimary"] = ms
        sel = jax.jit(pt.select_closest_hits)
        hits, ms = _timed(sel, params, hits, add_hits, origins, runs=runs)
        t.ms["selectClosestPrimary"] = ms

    path, ms = _timed(jax.jit(pt.init_path_state), params, env, hits, dirs,
                      runs=runs)
    t.ms["initPathState"] = ms

    incoming = None
    cur_hits = hits
    for bounce in range(1, params.max_bounces + 1):
        sample = jax.jit(lambda p, pi, so, h, a, inc: pt.sample_bounce_directions(
            p, pi, so, h, a, inc))
        rays, ms = _timed(sample, params, pixel_idx, sample_of, cur_hits,
                          path.active, incoming, runs=runs)
        t.ms["sampleBounce"] += ms
        path = pt.update_active_after_sampling(path, cur_hits, rays)

        # The production frame fuses early termination + shell entry into
        # one sweep (bounce_shell_entry_and_early_term); time that fused
        # stage as earlyTermination and the remaining march as shellTrace.
        early = jax.jit(lambda c, r, a: bounce_shell_entry_and_early_term(
            c, r, a))
        (active, entry), ms = _timed(early, ctx, rays, path.active,
                                     runs=runs)
        t.ms["earlyTermination"] += ms
        path = path._replace(active=active)

        march_b = jax.jit(lambda c, p, r, a, e: trace_neural_segments(
            c, p, r.origin, r.direction, ray_active=a, pdfs=r.pdf,
            camera_rays=False, compute_dtype=compute_dtype, entry=e))
        bh, ms = _timed(march_b, ctx, params, rays, path.active, entry,
                        runs=runs)
        t.ms["shellTrace"] += ms
        t.neural_ray_calls += n

        if use_additional and not additional_mesh.is_empty:
            addb = jax.jit(lambda m, p, r: pt.trace_rays_mesh(
                m, p, r.origin, r.direction, traversal.ANY,
                active=r.pdf > 0.0))
            add_hits, ms = _timed(addb, additional_mesh, params, rays, runs=runs)
            t.ms["additionalMeshBounce"] += ms
            sel = jax.jit(pt.select_closest_hits)
            bh, ms = _timed(sel, params, bh, add_hits, rays.origin, runs=runs)
            t.ms["selectClosestBounce"] += ms

        integrate = jax.jit(lambda p, e, pa, b, r, pi, so, bi=bounce:
                            pt.integrate_bounce(p, e, pa, b, r, bi, pi, so))
        path, ms = _timed(integrate, params, env, path, bh, rays, pixel_idx,
                          sample_of, runs=runs)
        t.ms["integrateBounce"] += ms
        incoming = rays.direction
        cur_hits = bh

    (_, _), ms = _timed(jax.jit(pt.finalize), params, path.radiance, accum,
                        runs=runs)
    t.ms["finalize"] = ms

    frame = jax.jit(render_neural_frame,
                    static_argnames=("use_additional", "compute_dtype"))
    _, t.frame_total_ms = _timed(
        frame, ctx, additional_mesh, env, params, accum, runs=runs)
    return t


def profile_neural_frame_by_bounce(ctx, additional_mesh, env, params,
                                   use_additional=False,
                                   compute_dtype=jnp.bfloat16,
                                   runs=2) -> dict:
    """Fused-frame wall-clock at max_bounces = 0..params.max_bounces.

    Unlike the category re-runs above, these are whole-program numbers: the
    increment between consecutive bounce counts is what that bounce actually
    costs inside the fused frame (including its compaction conds, sorting and
    any work XLA fuses across stages). Used to size the compaction tier
    ladder (BASELINE.md). Returns {"frame_ms": [ms at b=0, ...],
    "bounce_ms": [increment of bounce 1, ...], "ray_count": n}.

    Each bounce count is a separate XLA program — on a slow-compile host this
    is max_bounces+1 full frame compiles; drop the resolution first.
    """
    import dataclasses

    from .neural_frame import render_neural_frame

    accum = jnp.zeros((3, params.pixel_count), jnp.float32)
    frame = jax.jit(render_neural_frame,
                    static_argnames=("use_additional", "compute_dtype"))
    frame_ms = []
    for b in range(params.max_bounces + 1):
        p = dataclasses.replace(params, max_bounces=b)
        run = lambda c, a, e, pp, ac: frame(c, a, e, pp, ac,
                                            use_additional=use_additional,
                                            compute_dtype=compute_dtype)
        _, ms = _timed(run, ctx, additional_mesh, env, p, accum, runs=runs)
        frame_ms.append(ms)
    return {
        "frame_ms": frame_ms,
        "bounce_ms": [frame_ms[i] - frame_ms[i - 1]
                      for i in range(1, len(frame_ms))],
        "ray_count": params.pixel_count * params.samples_per_pixel,
    }

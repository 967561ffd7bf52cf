"""Decompose the bounce-1 stage cost at full resolution with TRUE in-jit
repetition (chained data dependencies, like profile_camera_stage.py): where
do the +97 ms/bounce at 1080p go — sampling, prefix build (nonzero + packed
gather + sort), the compacted stage's sweeps/march, the scatter-back, or the
full-batch integrator?

Uses the REAL bounce-ray distribution: a camera stage + init_path_state +
sample_bounce_directions produce the rays, exactly like the frame's bounce 1
(bench methodology: random-init lane-grid weights, same as bench.py).

Usage: python scripts/profile_bounce_stage.py [WIDTH HEIGHT [REPS]]
Env: BENCH_SCENE=sphere|knot, PROFILE_LANE_SUBLANES=N
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def chain_timed(name, step, init, reps=8):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, reps, lambda i, c: step(c), c)

    r = run(init)
    _sync(r)
    t0 = time.perf_counter()
    r = run(init)
    _sync(r)
    dt = (time.perf_counter() - t0) / reps
    return name, dt


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import bench
    from neural_renderer_tpu.models import nbvh
    from neural_renderer_tpu.ops import traversal
    from neural_renderer_tpu.render import neural_frame as nf
    from neural_renderer_tpu.render import pathtrace as pt
    from neural_renderer_tpu.render.neural_march import (
        NeuralContext, bounce_shell_entry_and_early_term,
        trace_neural_segments)
    from neural_renderer_tpu.render.params import RenderParams
    from neural_renderer_tpu.scene.envmap import EnvironmentMap
    from neural_renderer_tpu.scene.materials import Material
    from neural_renderer_tpu.scene.mesh import Mesh

    original, inner, outer, additional = bench.build_scene()
    dev = jax.devices()[0]
    put = lambda t: jax.device_put(t, dev)
    outer_a = put(outer.to_arrays())
    inner_a = put(inner.to_arrays())
    env = put(EnvironmentMap().to_arrays())
    add_a = put(Mesh().to_arrays())

    lane_s = int(os.environ.get("PROFILE_LANE_SUBLANES", "16"))
    cfg = nbvh.NbvhConfig(grid_type="lane", lane_sublanes=lane_s)
    ctx = NeuralContext(outer=outer_a, inner=inner_a,
                        net_params=put(nbvh.init_params(jax.random.PRNGKey(0),
                                                        cfg)),
                        config=cfg)

    omin, omax = outer.bounds()
    params = put(RenderParams.make(
        width=width, height=height, samples_per_pixel=1, max_bounces=3,
        cam_pos=[0.0, 0.0, 3.0], cam_forward=[0.0, 0.0, -1.0],
        cam_right=[1.0, 0.0, 0.0], cam_up=[0.0, 1.0, 0.0], fov_y=0.9,
        material=Material.default(), scene_scale=2.0,
        outer_shell_min=omin, outer_shell_inv_extent=1.0 / (omax - omin)))
    n = width * height
    print(f"rays: {n}")

    # --- Real bounce-1 inputs, computed once (frame prefix up to bounce 1).
    @jax.jit
    def make_inputs():
        pixel_idx, sample_of, _, origins, dirs = pt.primary_rays(params)
        hits = trace_neural_segments(ctx, params, origins, dirs,
                                     camera_rays=True,
                                     compute_dtype=jnp.bfloat16)
        path = pt.init_path_state(params, env, hits, dirs)
        rays = pt.sample_bounce_directions(params, pixel_idx, sample_of,
                                           hits, path.active, None)
        path2 = pt.update_active_after_sampling(path, hits, rays)
        return pixel_idx, sample_of, hits, path, rays, path2

    pixel_idx, sample_of, hits0, path0, rays0, path1 = jax.device_put(
        make_inputs(), dev)
    mask = path1.active & (rays0.pdf > 0.0)
    count = int(jnp.sum(mask.astype(jnp.int32)))
    print(f"bounce-1 active count: {count} ({count / n:.3f})")
    tiers = sorted({max(512, n // 8), max(512, n // 4), max(512, n // 2)})
    k = next((t for t in tiers if count <= t), n)
    print(f"tier k = {k} (n/{n // k})")

    results = []

    # 1. Full-batch Disney sampling.
    def sample_step(h):
        rays = pt.sample_bounce_directions(params, pixel_idx, sample_of,
                                           h, path0.active, None)
        return h._replace(position=h.position + rays.direction * 1e-33)

    results.append(chain_timed("sample_bounce", sample_step, hits0,
                               reps=reps))

    # 2. Prefix build: nonzero + packed gather + k-key sort + reorders.
    def prefix_step(r):
        m = path1.active & (r.pdf > 0.0)
        cnt = jnp.sum(m.astype(jnp.int32))
        (idx0,) = jnp.nonzero(m, size=k, fill_value=n)
        valid0 = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0] < cnt
        packed = jnp.concatenate([r.origin, r.direction, r.pdf[None, :],
                                  r.distance[None, :]], axis=0)
        pk = jnp.take(packed, idx0, axis=1, mode="clip")
        order_k = traversal._ray_sort_order(pk[0:3], pk[3:6], valid0)
        idx = jnp.take(idx0, order_k)
        pk = jnp.take(pk, order_k, axis=1)
        leak = (jnp.sum(pk[0]) + jnp.sum(idx.astype(jnp.float32))) * 1e-33
        return r._replace(pdf=r.pdf + leak)

    results.append(chain_timed("prefix_build", prefix_step, rays0,
                               reps=reps))

    # Materialize the sorted prefix once for the stage-piece timings.
    @jax.jit
    def build_prefix(r):
        m = path1.active & (r.pdf > 0.0)
        cnt = jnp.sum(m.astype(jnp.int32))
        (idx0,) = jnp.nonzero(m, size=k, fill_value=n)
        valid0 = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0] < cnt
        packed = jnp.concatenate([r.origin, r.direction, r.pdf[None, :],
                                  r.distance[None, :]], axis=0)
        pk = jnp.take(packed, idx0, axis=1, mode="clip")
        order_k = traversal._ray_sort_order(pk[0:3], pk[3:6], valid0)
        idx = jnp.take(idx0, order_k)
        pk = jnp.take(pk, order_k, axis=1)
        slot = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]
        valid = slot < cnt
        rays_k = pt.BounceRays(origin=pk[0:3], direction=pk[3:6],
                               pdf=jnp.where(valid, pk[6], 0.0),
                               brdf_weight=jnp.zeros((3, k), jnp.float32),
                               distance=pk[7])
        return rays_k, valid, idx

    rays_k, valid_k, idx_k = jax.device_put(build_prefix(rays0), dev)

    # 3. Early-termination + entry sweep on the sorted k prefix.
    def entry_step(rk):
        act, entry = bounce_shell_entry_and_early_term(ctx, rk, valid_k)
        leak = jnp.where(act, entry.outer_fwd, 0.0)
        return rk._replace(origin=rk.origin + leak[None, :] * 1e-33)

    results.append(chain_timed("entry_early_term_k", entry_step, rays_k,
                               reps=reps))

    # 4. Shell march on the sorted k prefix (includes its own entry sweep —
    #    subtract entry_early_term_k for the marginal march cost).
    def march_step(rk):
        act, entry = bounce_shell_entry_and_early_term(ctx, rk, valid_k)
        h = trace_neural_segments(ctx, params, rk.origin, rk.direction,
                                  ray_active=act, pdfs=rk.pdf,
                                  camera_rays=False,
                                  compute_dtype=jnp.bfloat16, entry=entry)
        return rk._replace(origin=rk.origin + h.distance[None, :] * 1e-33)

    results.append(chain_timed("entry+march_k", march_step, rays_k,
                               reps=reps))

    # 5. Scatter-back (12 per-row scatters at k indices).
    hits_k, act_k = nf._bounce_stage(ctx, params, add_a, False, jnp.bfloat16,
                                     rays_k, valid_k)
    hits_k = jax.device_put(hits_k, dev)

    def scatter_step(hk):
        def srow(vals):
            return jnp.zeros((n,), vals.dtype).at[idx_k].set(vals,
                                                             mode="drop")

        rows = [srow(hk.position[i]) for i in range(3)]
        rows += [srow(hk.normal[i]) for i in range(3)]
        rows += [srow(hk.albedo[i]) for i in range(3)]
        rows.append(srow(jnp.where(valid_k, hk.distance, 0.0)))
        hitf = srow(hk.hit & valid_k)
        leak = (sum(jnp.sum(r) for r in rows)
                + jnp.sum(hitf.astype(jnp.float32))) * 1e-33
        return hk._replace(distance=hk.distance + leak)

    results.append(chain_timed("scatter_back", scatter_step, hits_k,
                               reps=reps))

    # 6. Full-batch integrator.
    hits_full = pt.HitState(
        position=jnp.zeros((3, n), jnp.float32),
        normal=jnp.zeros((3, n), jnp.float32),
        albedo=jnp.zeros((3, n), jnp.float32),
        material_params=jnp.zeros((3, n), jnp.float32),
        hit=jnp.zeros((n,), bool), distance=jnp.zeros((n,), jnp.float32))

    def integrate_step(p):
        p2 = pt.integrate_bounce(params, env, p, hits_full, rays0, 1,
                                 pixel_idx, sample_of)
        return p2._replace(radiance=p2.radiance * (1.0 - 1e-33))

    results.append(chain_timed("integrate_full", integrate_step, path1,
                               reps=reps))

    # 7. The whole compacted stage, for cross-checking the sum.
    def stage_step(r):
        h, act = nf._bounce_stage_compacted(ctx, params, add_a, False,
                                            jnp.bfloat16, r, path1.active)
        return r._replace(origin=r.origin + h.distance[None, :] * 1e-33)

    results.append(chain_timed("stage_compacted_full", stage_step, rays0,
                               reps=reps))

    # 8. Whole bounce body (sampling + stage + integrate), the frame's unit.
    def body_step(p):
        rays = pt.sample_bounce_directions(params, pixel_idx, sample_of,
                                           hits0, p.active, None)
        p2 = pt.update_active_after_sampling(p, hits0, rays)
        h, act = nf._bounce_stage_compacted(ctx, params, add_a, False,
                                            jnp.bfloat16, rays, p2.active)
        p3 = p2._replace(active=act)
        return pt.integrate_bounce(params, env, p3, h, rays, 1, pixel_idx,
                                   sample_of)

    results.append(chain_timed("bounce_body_full", body_step, path0,
                               reps=reps))

    print()
    for name, dt in results:
        print(f"{name:22s} {dt * 1e3:9.2f} ms   {dt / n * 1e9:7.1f} ns/ray")


if __name__ == "__main__":
    main()

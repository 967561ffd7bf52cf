"""Decompose frame cost at full resolution with TRUE in-jit repetition:
every iteration's input depends on the previous iteration's output, so XLA
can neither hoist the body out of the loop nor dead-code it. Separately
measures the per-dispatch floor (trivial jitted op, per-call) to quantify
what the per-call bench pays on the remote 'axon' platform.

Usage: python scripts/profile_camera_stage.py [WIDTH HEIGHT [REPS]]
Env: BENCH_SCENE=sphere|knot, PROFILE_LANE_SUBLANES=N
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def chain_timed(name, step, init, reps=8):
    """step: carry -> carry (same pytree structure, REAL data dependency)."""
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, reps, lambda i, c: step(c), c)

    r = run(init)
    _sync(r)  # compile + warm
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
    from neural_renderer_tpu.render import pathtrace as pt
    from neural_renderer_tpu.render.neural_march import (NeuralContext,
                                                         trace_neural_segments)
    from neural_renderer_tpu.render.neural_frame import render_neural_frame
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

    def make_params(b):
        return put(RenderParams.make(
            width=width, height=height, samples_per_pixel=1, max_bounces=b,
            cam_pos=[0.0, 0.0, 3.0], cam_forward=[0.0, 0.0, -1.0],
            cam_right=[1.0, 0.0, 0.0], cam_up=[0.0, 1.0, 0.0], fov_y=0.9,
            material=Material.default(), scene_scale=2.0,
            outer_shell_min=omin, outer_shell_inv_extent=1.0 / (omax - omin)))

    params = make_params(0)
    n = width * height
    _, _, _, origins, dirs = pt.primary_rays(params)
    origins = put(origins)
    dirs = put(dirs)
    print(f"rays: {n}")

    results = []

    # Per-dispatch floor: trivial jitted op, timed per call.
    @jax.jit
    def triv(x):
        return x + 1.0

    x = put(jnp.float32(0.0))
    x = triv(x)
    _sync(x)
    t0 = time.perf_counter()
    for _ in range(4):
        x = triv(x)
        _sync(x)
    floor = (time.perf_counter() - t0) / 4
    print(f"per-call floor (trivial jit + scalar sync): {floor * 1e3:.1f} ms")

    # Chained sweeps: origins perturbed by the previous result.
    def sweep_step(o):
        sw = traversal.sweep_shells(ctx.outer, ctx.inner, o, dirs,
                                    with_fwd2=True)
        leak = jnp.where(sw.outer_fwd < 1e30, sw.outer_fwd, 0.0)
        return o + leak[None, :] * 1e-33

    results.append(chain_timed("fwd2_sweep", sweep_step, origins, reps=reps))

    def plain_step(o):
        sw = traversal.sweep_shells(ctx.outer, ctx.inner, o, dirs)
        leak = jnp.where(sw.outer_fwd < 1e30, sw.outer_fwd, 0.0)
        return o + leak[None, :] * 1e-33

    results.append(chain_timed("plain_sweep", plain_step, origins, reps=reps))

    # Chained network forward (all-active).
    net_in = jnp.concatenate([(origins + 1.5) / 3.0, (origins + 1.5) / 3.0,
                              (origins + 1.5) / 3.0, (dirs + 1.0) * 0.5],
                             axis=0)

    def net_step(xin):
        out = nbvh.apply(ctx.net_params, xin, ctx.config,
                         compute_dtype=jnp.bfloat16, use_kernel=True)
        return xin + out[0][None, :].astype(jnp.float32) * 1e-33

    results.append(chain_timed("network_all_active", net_step, put(net_in),
                               reps=reps))

    # Entry-active mask variant.
    sw = traversal.sweep_shells(ctx.outer, ctx.inner, origins, dirs,
                                with_fwd2=True)
    active = put(sw.outer_fwd < 1e30)
    print(f"entry-active fraction: "
          f"{float(jnp.mean(active.astype(jnp.float32))):.3f}")

    def net_step_masked(xin):
        out = nbvh.apply(ctx.net_params, xin, ctx.config,
                         compute_dtype=jnp.bfloat16, use_kernel=True,
                         active=active)
        return xin + out[0][None, :].astype(jnp.float32) * 1e-33

    results.append(chain_timed("network_entry_active", net_step_masked,
                               put(net_in), reps=reps))

    # Chained camera march.
    def march_step(o):
        hits = trace_neural_segments(ctx, params, o, dirs, camera_rays=True,
                                     compute_dtype=jnp.bfloat16)
        return o + hits.distance[None, :] * 1e-33

    results.append(chain_timed("camera_march", march_step, origins,
                               reps=reps))

    # Full frames b0..b3, chained through accum (the production accumulation
    # loop inside ONE dispatch).
    for b in (0, 1, 2, 3):
        pb = make_params(b)

        def frame_step(ac, pb=pb):
            img, ac2 = render_neural_frame(ctx, add_a, env, pb, ac,
                                           compute_dtype=jnp.bfloat16)
            return ac2

        results.append(chain_timed(f"frame_b{b}", frame_step,
                                   put(jnp.zeros((3, n), jnp.float32)),
                                   reps=reps))

    print()
    for name, dt in results:
        print(f"{name:22s} {dt * 1e3:9.2f} ms   {dt / n * 1e9:7.1f} ns/ray")


if __name__ == "__main__":
    main()

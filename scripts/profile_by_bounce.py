"""Per-bounce fused-frame decomposition at full resolution on the current
accelerator (profile_neural_frame_by_bounce): the increment between
consecutive max_bounces values is what each bounce actually costs inside the
fused frame. Warning: max_bounces+1 full frame compiles.

Usage: python scripts/profile_by_bounce.py [WIDTH HEIGHT [SPP [BOUNCES]]]
Env: PROFILE_GRID=lane|tcnn, PROFILE_LANE_SUBLANES=N, BENCH_SCENE=sphere|knot
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    bounces = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    import bench
    import jax

    from neural_renderer_tpu.models import nbvh
    from neural_renderer_tpu.render.neural_march import NeuralContext
    from neural_renderer_tpu.render.params import RenderParams
    from neural_renderer_tpu.render.profiler import \
        profile_neural_frame_by_bounce
    from neural_renderer_tpu.scene.envmap import EnvironmentMap
    from neural_renderer_tpu.scene.materials import Material
    from neural_renderer_tpu.scene.mesh import Mesh

    original, inner, outer, additional = bench.build_scene()
    dev = jax.devices()[0]
    put = lambda t: jax.device_put(t, dev)
    outer_a = put(outer.to_arrays())
    inner_a = put(inner.to_arrays())
    env = put(EnvironmentMap().to_arrays())

    grid = os.environ.get("PROFILE_GRID", "lane")
    lane_s = int(os.environ.get("PROFILE_LANE_SUBLANES", "16"))
    cfg = (nbvh.NbvhConfig(grid_type="lane", lane_sublanes=lane_s)
           if grid == "lane" else nbvh.NbvhConfig())
    ctx = NeuralContext(outer=outer_a, inner=inner_a,
                        net_params=put(nbvh.init_params(jax.random.PRNGKey(0),
                                                        cfg)),
                        config=cfg)

    omin, omax = outer.bounds()
    params = put(RenderParams.make(
        width=width, height=height, samples_per_pixel=spp,
        max_bounces=bounces,
        cam_pos=[0.0, 0.0, 3.0], cam_forward=[0.0, 0.0, -1.0],
        cam_right=[1.0, 0.0, 0.0], cam_up=[0.0, 1.0, 0.0], fov_y=0.9,
        material=Material.default(), scene_scale=2.0,
        outer_shell_min=omin, outer_shell_inv_extent=1.0 / (omax - omin)))

    prof = profile_neural_frame_by_bounce(ctx, put(Mesh().to_arrays()), env,
                                          params, compute_dtype=jnp.bfloat16)
    n = prof["ray_count"]
    print(f"rays: {n}")
    for b, ms in enumerate(prof["frame_ms"]):
        print(f"max_bounces={b}: {ms:8.1f} ms  "
              f"({n / ms / 1e3:6.3f} Mrays/s)")
    for i, ms in enumerate(prof["bounce_ms"], start=1):
        print(f"bounce {i} increment: {ms:8.1f} ms")


if __name__ == "__main__":
    main()

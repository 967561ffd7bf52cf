"""Sampler-only profile: where does sample_segment_batch time go, and why
does it blow up super-linearly at B=262k (fused full step 522 ms vs net-only
66 ms)? Stages: ray gen / entry trace / exit+inner traces / GT trace /
hit-data+material. Also measures segments_per_ray amortization.

Usage: python scripts/profile_sampler.py
"""

import sys
import time

sys.path.insert(0, ".")
from neural_renderer_tpu.utils.compile_cache import enable

enable()

import jax
import jax.numpy as jnp

from neural_renderer_tpu.config import load_config
from neural_renderer_tpu.ops import traversal
from neural_renderer_tpu.scene.scene import Scene
from neural_renderer_tpu.train import scene_global_row, segment_domain
from neural_renderer_tpu.train.dataset import sample_segment_batch


def timeit(fn, *args, n=5):
    fn(*args)
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.monotonic() - t0) / n


def main():
    cfg = load_config("configs/sphere/sphere_lane.json")
    scene = Scene.from_config(cfg, sphere_fallback=False)
    gt = scene.original_mesh.to_arrays()
    outer = scene.outer_shell.to_arrays()
    inner = scene.inner_shell.to_arrays()
    omin, inv, radius = segment_domain(scene)
    grow = scene_global_row(scene)
    key = jax.random.PRNGKey(0)
    R = 5

    def rays_for(B, k):
        k1, k2 = jax.random.split(k)
        o = jax.random.normal(k1, (3, B), jnp.float32)
        o = o / jnp.linalg.norm(o, axis=0, keepdims=True) * radius
        u = jax.random.uniform(k2, (3, B), jnp.float32)
        target = omin[:, None] + u / jnp.maximum(inv[:, None], 1e-12)
        d = target - o
        return o, d / jnp.linalg.norm(d, axis=0, keepdims=True)

    for B in (16384, 65536, 262144):
        o, d = jax.jit(rays_for, static_argnums=0)(B, key)
        o, d = o.block_until_ready(), d.block_until_ready()

        def reps(trace_fn):
            @jax.jit
            def run(o, d):
                def body(i, acc):
                    r = trace_fn(o + acc * 0, d)
                    return acc + r.t.sum()
                return jax.lax.fori_loop(0, R, body, jnp.float32(0))
            return timeit(run, o, d) / R

        t_outer = reps(lambda o, d: traversal.trace_mesh(
            outer, o, d, traversal.FORWARD_ONLY))
        t_gt = reps(lambda o, d: traversal.trace_mesh(
            gt, o, d, traversal.ANY))

        @jax.jit
        def full(k):
            def body(i, carry):
                k, acc = carry
                k, sub = jax.random.split(k)
                b = sample_segment_batch(sub, gt, outer, inner, omin, inv, B,
                                         radius, 1, grow)
                return k, acc + b.inputs.sum()
            return jax.lax.fori_loop(0, R, body, (k, jnp.float32(0)))[1]
        t_full = timeit(full, key) / R

        print(f"B={B:7d}  outer fwd: {t_outer*1e3:7.2f} ms  "
              f"gt any: {t_gt*1e3:7.2f} ms  full sampler: {t_full*1e3:7.2f} ms"
              f"  ({B/t_full/1e6:5.2f} Mseg/s)")

    # segments_per_ray amortization at B=262144 segments
    for s in (1, 2, 4):
        B = 262144

        @jax.jit
        def full_s(k, s=s):
            def body(i, carry):
                k, acc = carry
                k, sub = jax.random.split(k)
                b = sample_segment_batch(sub, gt, outer, inner, omin, inv, B,
                                         radius, s, grow)
                return k, acc + b.inputs.sum()
            return jax.lax.fori_loop(0, R, body, (k, jnp.float32(0)))[1]
        t = timeit(full_s, key) / R
        print(f"B={B} s={s}: {t*1e3:7.2f} ms ({B/t/1e6:5.2f} Mseg/s)")


if __name__ == "__main__":
    main()

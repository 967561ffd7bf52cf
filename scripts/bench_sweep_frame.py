"""In-frame shell-sweep A/B: time traversal.sweep_shells exactly as the
camera stage calls it (2.07M camera rays, sphere shells, with_fwd2) while
varying the kernel configuration:

  --cluster-tile N   trace_cluster.TRI_TILE (cluster sweep register width)
  --clustered on|off|auto   force / forbid the clustered streaming sweep
                            (off -> the dense masked sweep_shells_pallas)
  --rays N --reps N

One process per configuration (module constants + jit caches).
Usage (TPU): python scripts/bench_sweep_frame.py --cluster-tile 128
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neural_renderer_tpu.utils.compile_cache import enable as _enable

_enable()

argv = sys.argv[1:]


def opt(name, default, cast=int):
    if name not in argv:
        return default
    i = argv.index(name)
    val = cast(argv[i + 1])
    del argv[i:i + 2]
    return val


CLUSTER_TILE = opt("--cluster-tile", None)
DENSE_TILE = opt("--dense-tile", None)
CLUSTERED = opt("--clustered", "auto", str)
N = opt("--rays", 2073600)
REPS = opt("--reps", 4)

from neural_renderer_tpu.ops import trace_cluster, trace_pallas, traversal

if CLUSTER_TILE:
    trace_cluster.TRI_TILE = CLUSTER_TILE
if DENSE_TILE:
    trace_pallas.TRI_TILE = DENSE_TILE
if CLUSTERED == "off":
    traversal._CLUSTERED_SWEEP_MIN_TRIS = 1 << 30
elif CLUSTERED == "on":
    traversal._CLUSTERED_SWEEP_MIN_TRIS = 0

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_example_scene import outward_sphere

    outer = outward_sphere(24, 48, 1.15).to_arrays()
    inner = outward_sphere(24, 48, 0.85).to_arrays()

    # Camera rays exactly like the 1080p frame: full pixel grid, one origin.
    w, h = 1920, -(-N // 1920)
    xs = (np.arange(w) / w - 0.5) * 1.2
    ys = (np.arange(h) / h - 0.5) * 0.675
    gx, gy = np.meshgrid(xs, ys)
    d = np.stack([gx.ravel()[:N], gy.ravel()[:N], -np.ones(N)], axis=0)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    o = np.broadcast_to(np.array([0.0, 0.0, 3.0])[:, None], (3, N)).copy()
    oj = jnp.asarray(o, jnp.float32)
    dj = jnp.asarray(d, jnp.float32)

    @jax.jit
    def run(o_in):
        def body(i, acc):
            sw = traversal.sweep_shells(outer, inner, o_in + acc * 1e-12, dj,
                                        with_fwd2=True)
            return acc + sw.outer_fwd[0]
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(run(oj))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(oj))
        best = min(best, (time.perf_counter() - t0) / REPS)
    sw = traversal.sweep_shells(outer, inner, oj, dj, with_fwd2=True)
    cs = float(jnp.sum(jnp.where(sw.outer_fwd < 1e30, sw.outer_fwd, 0.0)))
    print(f"cluster_tile {trace_cluster.TRI_TILE} clustered {CLUSTERED}: "
          f"{best * 1e3:8.2f} ms/call  {best / N * 1e9:6.1f} ns/ray  "
          f"checksum {cs:.4f}", flush=True)


if __name__ == "__main__":
    main()

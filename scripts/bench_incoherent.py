"""Incoherent-vs-coherent clustered-trace bench (VERDICT r4 item 4).

Round 2 measured the streaming cluster trace at 405 ns/ray coherent vs
1598 ns/ray fully-random incoherent on the 57.6k-tri workload (~4x).
Random rays sort into blocks whose origin-region x direction-cone frusta
overlap several times more clusters than a shared-origin camera frustum
does, so each block sweeps more triangles. This bench measures that
cluster-footprint effect directly and sweeps the one structural knob the
design leaves: BLOCK_RAYS (smaller blocks -> tighter frusta -> fewer
clusters each, but more per-block fixed costs and narrower VPU tiles).

Usage (TPU): python scripts/bench_incoherent.py [--block 512] [--rays N]
             [--reps N] [--mesh knot|sphere57k]
One process per block size (jit caches + module constants).
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


BLOCK = opt("--block", 512)
CLUSTER_TILE = opt("--cluster-tile", 0)
N = opt("--rays", 262144)
REPS = opt("--reps", 8)
MESH = opt("--mesh", "knot", str)

# Patch the block size BEFORE anything traces: traversal.py re-imports the
# constant inside each call, and trace_cluster reads its module global at
# trace time, so setting both attrs up front re-parametrizes the whole
# two-level path for this process.
from neural_renderer_tpu.ops import trace_cluster, trace_pallas, traversal

trace_pallas.BLOCK_RAYS = BLOCK
trace_cluster.BLOCK_RAYS = BLOCK
if CLUSTER_TILE:
    trace_cluster.TRI_TILE = CLUSTER_TILE

import jax
import jax.numpy as jnp


def main():
    if MESH == "knot":
        from neural_renderer_tpu.scene.mesh_loader import load_mesh_auto
        base = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs", "knot")
        mesh = load_mesh_auto(os.path.join(base, "original.obj")).to_arrays()
        cam = np.array([0.0, 0.0, 7.0])
        extent = 3.0
    else:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from make_example_scene import outward_sphere
        mesh = outward_sphere(120, 240, 1.0).to_arrays()
        cam = np.array([0.0, 0.0, 3.0])
        extent = 1.2

    rng = np.random.default_rng(0)

    # Coherent: camera-style rays through a pixel grid from one origin.
    w = int(np.sqrt(N * 16 / 9))
    h = -(-N // w)
    xs = (np.arange(w) / w - 0.5) * 1.2
    ys = (np.arange(h) / h - 0.5) * 0.675
    gx, gy = np.meshgrid(xs, ys)
    d_coh = np.stack([gx.ravel()[:N], gy.ravel()[:N], -np.ones(N)], axis=0)
    d_coh /= np.linalg.norm(d_coh, axis=0, keepdims=True)
    o_coh = np.broadcast_to(cam[:, None], (3, N)).copy()

    # Incoherent: random origins in the scene shell, random directions —
    # the bounce-ray regime (origins on surfaces, sampled directions).
    o_inc = rng.normal(size=(3, N))
    o_inc = o_inc / np.linalg.norm(o_inc, axis=0, keepdims=True) * extent
    d_inc = rng.normal(size=(3, N))
    d_inc /= np.linalg.norm(d_inc, axis=0, keepdims=True)

    def timed(o, d, label):
        oj = jnp.asarray(o, jnp.float32)
        dj = jnp.asarray(d, jnp.float32)

        @jax.jit
        def run(o_in):
            def body(i, acc):
                r = traversal.trace_mesh(mesh, o_in + acc * 1e-12, dj)
                return acc + r.t[0]
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        float(run(oj))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(oj))
            best = min(best, (time.perf_counter() - t0) / REPS)
        r = traversal.trace_mesh(mesh, oj, dj)
        hits = float(jnp.mean((r.t < 1e30).astype(jnp.float32)))
        print(f"block {BLOCK:4d} {label}: {best * 1e3:8.2f} ms/call  "
              f"{best / N * 1e9:7.1f} ns/ray  {N / best / 1e6:6.2f} Mrays/s  "
              f"(hit rate {hits:.3f})", flush=True)
        return best

    print(f"mesh {MESH}: {mesh.num_triangles} tris, {N} rays, reps {REPS}, "
          f"BLOCK_RAYS {BLOCK}")
    t_coh = timed(o_coh, d_coh, "coherent  ")
    t_inc = timed(o_inc, d_inc, "incoherent")
    print(f"incoherent/coherent ratio: {t_inc / t_coh:.2f}x")


if __name__ == "__main__":
    main()

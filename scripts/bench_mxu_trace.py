"""A/B micro-bench: VPU dense trace kernel vs the MXU matmul formulation.

Times trace_pallas.trace_dense_pallas against trace_mxu.trace_dense_mxu_pallas
on the same workload with in-jit repetition (one dispatch, REPS kernel calls
chained by data dependency — the BASELINE.md methodology; the ~40 ms axon RPC
floor would otherwise swamp per-call numbers). Run on the TPU:

    python scripts/bench_mxu_trace.py [num_tris=9216] [n_rays=262144] [reps=8]

Decision input for BASELINE.md roadmap lever 6 (MXU Möller–Trumbore): port
the formulation to the cluster kernels only if this shows >=1.5x.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    num_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 9216
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    from neural_renderer_tpu.ops.trace_mxu import trace_dense_mxu_pallas
    from neural_renderer_tpu.ops.trace_pallas import (TRI_TILE,
                                                      trace_dense_pallas)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_example_scene import outward_sphere

    stacks = max(4, int((num_tris / 4) ** 0.5))
    mesh = outward_sphere(stacks, 2 * stacks, 1.0).to_arrays()
    tp = mesh.tris_packed
    t_real = tp.shape[1]
    t_pad = -(-t_real // TRI_TILE) * TRI_TILE
    tp = jnp.pad(tp, ((0, 0), (0, t_pad - t_real)))
    tiles = t_pad // TRI_TILE

    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3))
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 3.0
    tgt = rng.normal(size=(n, 3)) * 0.6
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj = jnp.asarray(o.T, jnp.float32)
    dj = jnp.asarray(d.T, jnp.float32)

    def timed(kernel, label):
        @jax.jit
        def run(o_in):
            def body(i, acc):
                bt, _ = kernel(o_in + acc * 1e-12, dj, tp, 0, tiles)
                return acc + bt[0]
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        float(run(oj))  # compile + warm
        t0 = time.perf_counter()
        float(run(oj))
        dt = (time.perf_counter() - t0) / reps
        pairs = n * t_pad
        print(f"{label}: {dt * 1e3:.2f} ms/call, "
              f"{dt / pairs * 1e12:.1f} ps/pair, "
              f"{n / dt / 1e6:.2f} Mrays/s @ {t_real} tris")
        return dt

    t_vpu = timed(trace_dense_pallas, "VPU dense kernel  ")
    t_mxu = timed(trace_dense_mxu_pallas, "MXU matmul kernel ")
    print(f"MXU/VPU speedup: {t_vpu / t_mxu:.2f}x")

    # Agreement spot-check (hit mask + t) on the same inputs.
    bt1, id1 = trace_dense_pallas(oj, dj, tp, 0, tiles)
    bt2, id2 = trace_dense_mxu_pallas(oj, dj, tp, 0, tiles)
    h1 = np.asarray(bt1) < 1e30
    h2 = np.asarray(bt2) < 1e30
    both = h1 & h2
    dt_rel = np.abs(np.asarray(bt1)[both] - np.asarray(bt2)[both]) / \
        np.maximum(np.asarray(bt1)[both], 1e-6)
    print(f"hit mismatch {np.mean(h1 != h2):.2e}, "
          f"max rel t err {dt_rel.max():.2e}, "
          f"tri agreement {np.mean(np.asarray(id1)[both] == np.asarray(id2)[both]):.4f}")


if __name__ == "__main__":
    main()

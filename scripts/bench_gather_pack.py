"""Micro-benchmark: per-index vs per-element cost of XLA gathers/scatters.

Decides whether packing the bounce-prefix compaction rows (origin, direction,
pdf, distance -> one [8, N] gather; hit outputs -> one [12, k] scatter) beats
the current one-array-at-a-time ops. In-jit fori_loop repetition (one
dispatch) per variant; axon RPC floor is amortized.

Usage: python scripts/bench_gather_pack.py [N [K]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def timed(fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    out = jax.jit(fn)(*args)
    s = float(jnp.sum(out if isinstance(out, jnp.ndarray) else out[0]))  # sync
    dt = (time.monotonic() - t0) / REPS
    return dt, s


def chain(body, x, idx):
    """REPS dependent iterations of body (prevents dead-code elimination)."""
    def step(i, acc):
        return acc + body(x + acc[..., :1] * 0, idx)[..., :1] * 1e-30
    return jax.lax.fori_loop(0, REPS, step, jnp.zeros((x.shape[0], 1)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_073_600
    k = int(sys.argv[2]) if len(sys.argv) > 2 else n // 4
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.sort(rng.choice(n, size=k, replace=False)), jnp.int32)
    rows = {name: jnp.asarray(rng.uniform(size=(r, n)), jnp.float32)
            for name, r in [("a3", 3), ("b3", 3), ("c1", 1), ("d1", 1)]}
    packed = jnp.concatenate(list(rows.values()), axis=0)  # [8, n]
    upd = jnp.asarray(rng.uniform(size=(12, k)), jnp.float32)

    def g_separate(x, idx):
        outs = [jnp.take(r, idx, axis=1) for r in rows.values()]
        return jnp.concatenate(outs, axis=0)

    def g_packed(x, idx):
        return jnp.take(packed, idx, axis=1)

    def g_repacked(x, idx):
        p = jnp.concatenate(list(rows.values()), axis=0)
        return jnp.take(p, idx, axis=1)

    def s_separate(x, idx):
        outs = []
        for r0, r1 in [(0, 3), (3, 6), (6, 9), (9, 10), (10, 11), (11, 12)]:
            z = jnp.zeros((r1 - r0, n), jnp.float32)
            outs.append(z.at[:, idx].set(upd[r0:r1], mode="drop"))
        return jnp.concatenate(outs, axis=0)

    def s_packed(x, idx):
        z = jnp.zeros((12, n), jnp.float32)
        return z.at[:, idx].set(upd, mode="drop")

    for name, body in [("gather 4 ops (3+3+1+1 rows)", g_separate),
                       ("gather packed [8,n] (pre-stacked)", g_packed),
                       ("gather packed incl. re-stack", g_repacked),
                       ("scatter 6 ops (3+3+3+1+1+1)", s_separate),
                       ("scatter packed [12,n]", s_packed)]:
        def loop(x, idx, body=body):
            def step(i, acc):
                r = body(x, idx)
                return acc + r[0, :1] * 1e-30
            return jax.lax.fori_loop(0, REPS, step, jnp.zeros((1,)))
        f = jax.jit(loop)
        out = f(packed, idx)
        jax.block_until_ready(out)
        t0 = time.monotonic()
        float(f(packed, idx)[0])
        dt = (time.monotonic() - t0) / REPS
        print(f"{name:40s} {dt*1e3:8.2f} ms  ({dt/k*1e9:6.2f} ns/index)")


if __name__ == "__main__":
    main()

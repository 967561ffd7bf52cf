"""Micro-bench: strategies for the lane-grid table gradient (the training
bottleneck — tables-backward is ~44 of the 45 ms step at B=16k).

The forward is `jnp.take(table_fe[F,E], idx[N], axis=1) * w` per
(point, level, corner); autodiff transposes it to a scatter-add with an
[F,1] window per index. Round-2 window-shape lessons (BASELINE.md) say
column-window scatters are ~6x worse than per-row ones, and matmuls beat
both when the MXU can be kept busy. Candidates, all computing
dT[F,E] = sum_n g[F,n] * w[n] one-hot(idx[n]):

  a) take(axis=1) autodiff          — the current path
  b) per-feature-row take autodiff  — F [1,1]-window scatters
  c) custom_vjp: one-hot matmul     — g @ OH.T, f32
  d) custom_vjp: bf16 one-hot matmul with f32 accumulate

Usage: python scripts/bench_table_grad.py [--n 65536]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")
from neural_renderer_tpu.utils.compile_cache import enable

enable()

import jax
import jax.numpy as jnp
import numpy as np

P, L, F, E = 3, 8, 4, 4096  # lane S=16 pack=2 geometry
C = 8  # corners


def timeit(fn, *args, n=5):
    fn(*args)
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.monotonic() - t0) / n


def make_onehot_take(dtype):
    @jax.custom_vjp
    def take_mm(table_fe, idx):
        return jnp.take(table_fe, idx, axis=1)

    def fwd(table_fe, idx):
        return take_mm(table_fe, idx), idx

    def bwd(idx, g):
        oh = (idx[None, :] == jnp.arange(E, dtype=jnp.int32)[:, None])
        dT = jax.lax.dot_general(
            g.astype(dtype), oh.astype(dtype).T,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dT.astype(table_fe_dtype), None

    take_mm.defvjp(fwd, bwd)
    return take_mm


table_fe_dtype = jnp.float32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    N, R = args.n, args.reps

    key = jax.random.PRNGKey(0)
    tables = jax.random.normal(key, (P * L, F, E), jnp.float32)
    idx = jax.random.randint(key, (P * L, C, N), 0, E, jnp.int32)
    w = jax.random.uniform(key, (P * L, C, N), jnp.float32)

    def loss_with(take_fn):
        def loss(tables):
            total = 0.0
            for pl in range(P * L):
                acc = 0.0
                for c in range(C):
                    acc = acc + take_fn(tables[pl], idx[pl, c]) * w[pl, c][None, :]
                total = total + (acc * acc).sum()
            return total
        return loss

    variants = {
        "a_take_axis1": loss_with(lambda t, i: jnp.take(t, i, axis=1)),
        "b_per_row": loss_with(
            lambda t, i: jnp.stack([jnp.take(t[f], i) for f in range(F)])),
        "c_onehot_f32": loss_with(make_onehot_take(jnp.float32)),
        "d_onehot_bf16": loss_with(make_onehot_take(jnp.bfloat16)),
    }
    for name, loss in variants.items():
        @jax.jit
        def run(tables, loss=loss):
            def body(i, t):
                gr = jax.grad(loss)(t)
                return t - 1e-9 * gr
            return jax.lax.fori_loop(0, R, body, tables)
        t = timeit(run, tables) / R
        print(f"{name:15s}: {t*1e3:8.2f} ms  ({N/t/1e6:7.2f} Mseg/s)")


if __name__ == "__main__":
    main()

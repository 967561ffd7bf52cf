"""Follow-up: scatter layout variants (see bench_gather_pack.py results —
packed [12,1]-window column scatters are 5.6x SLOWER than separate ops).

Variants: transposed [n,12] destination with [1,12] row windows; 12 separate
[1,1] scatters; [3,1] windows (current production granularity).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_073_600
    k = int(sys.argv[2]) if len(sys.argv) > 2 else n // 4
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.sort(rng.choice(n, size=k, replace=False)), jnp.int32)
    upd = jnp.asarray(rng.uniform(size=(12, k)), jnp.float32)
    upd_t = jnp.asarray(np.asarray(upd).T.copy())

    def s_transposed(x, idx):
        z = jnp.zeros((n, 12), jnp.float32)
        return z.at[idx, :].set(upd_t, mode="drop").T

    def s_transposed_take(x, idx):
        # Includes the transposes a channel-major caller would need.
        z = jnp.zeros((n, 12), jnp.float32)
        out = z.at[idx, :].set(upd.T, mode="drop")
        return out.T

    def s_rows12(x, idx):
        outs = [jnp.zeros((n,), jnp.float32).at[idx].set(upd[r], mode="drop")
                for r in range(12)]
        return jnp.stack(outs, axis=0)

    def s_blocks3(x, idx):
        outs = []
        for r0 in range(0, 12, 3):
            z = jnp.zeros((3, n), jnp.float32)
            outs.append(z.at[:, idx].set(upd[r0:r0 + 3], mode="drop"))
        return jnp.concatenate(outs, axis=0)

    for name, body in [("scatter transposed [n,12] rows", s_transposed),
                       ("scatter transposed incl. upd.T", s_transposed_take),
                       ("scatter 12x [1,1]", s_rows12),
                       ("scatter 4x [3,1]", s_blocks3)]:
        def loop(x, idx, body=body):
            def step(i, acc):
                r = body(x, idx)
                return acc + r.reshape(-1)[:1] * 1e-30
            return jax.lax.fori_loop(0, REPS, step, jnp.zeros((1,)))
        f = jax.jit(loop)
        out = f(upd, idx)
        jax.block_until_ready(out)
        t0 = time.monotonic()
        float(f(upd, idx)[0])
        dt = (time.monotonic() - t0) / REPS
        print(f"{name:36s} {dt*1e3:8.2f} ms  ({dt/k*1e9:6.2f} ns/index)")


if __name__ == "__main__":
    main()

"""Stage breakdown of the training step (VERDICT r2 item 3).

Times, with in-jit repetition where possible (the ~36-41 ms per-dispatch RPC
floor on axon otherwise dominates; BASELINE.md methodology note):
  1. sampler alone (sample_segment_batch)
  2. forward+loss on a fixed batch
  3. value_and_grad + optimizer update on a fixed batch
  4. the full production step (sample + grad + update), one dispatch per step
  5. the full step scanned K-per-dispatch (lax.scan chaining)

Usage: python scripts/profile_train_step.py [config] [--batch 16384] [--reps 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from neural_renderer_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp

from neural_renderer_tpu.config import load_config
from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.scene.scene import Scene
from neural_renderer_tpu.train import (TrainConfig, init_train_state,
                                       make_train_step, scene_global_row,
                                       segment_domain)
from neural_renderer_tpu.train.dataset import sample_segment_batch
from neural_renderer_tpu.train.losses import shell_losses
from neural_renderer_tpu.train.trainer import make_optimizer

import optax


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    outs = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        outs)
    t0 = time.monotonic()
    for _ in range(n):
        outs = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        outs)
    return (time.monotonic() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="configs/sphere/sphere_lane.json")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--segments-per-ray", type=int, default=1)
    args = ap.parse_args()

    cfg = load_config(args.config)
    scene = Scene.from_config(cfg, sphere_fallback=False)
    net_config = nbvh.NbvhConfig(
        log2_hashmap_size=cfg.neural_network.log2_hashmap_size,
        base_resolution=cfg.neural_network.base_resolution,
        grid_type=cfg.neural_network.grid_type,
        lane_sublanes=cfg.neural_network.lane_sublanes,
        lane_entry_pack=cfg.neural_network.lane_entry_pack)
    tcfg = TrainConfig(batch_size=args.batch,
                       segments_per_ray=args.segments_per_ray)
    gt = scene.original_mesh.to_arrays()
    outer = scene.outer_shell.to_arrays()
    inner = scene.inner_shell.to_arrays()
    omin, inv, radius = segment_domain(scene)
    grow = scene_global_row(scene)
    state = init_train_state(tcfg, net_config)
    key = jax.random.PRNGKey(0)
    B = args.batch
    R = args.reps

    # 1. sampler, in-jit reps (chained by key folding)
    @jax.jit
    def sampler_reps(key):
        def body(i, carry):
            k, acc = carry
            k, sub = jax.random.split(k)
            b = sample_segment_batch(sub, gt, outer, inner, omin, inv, B,
                                     radius, tcfg.segments_per_ray, grow)
            return k, acc + b.inputs.sum() + b.presence.sum()
        return jax.lax.fori_loop(0, R, body, (key, jnp.float32(0)))[1]

    t = timeit(sampler_reps, key) / R
    print(f"1. sampler             : {t*1e3:8.2f} ms/step  ({B/t/1e6:6.2f} Mseg/s)")

    # fixed batch for 2/3
    batch = jax.jit(lambda k: sample_segment_batch(
        k, gt, outer, inner, omin, inv, B, radius,
        tcfg.segments_per_ray, grow))(key)
    batch = jax.tree_util.tree_map(lambda x: x.block_until_ready(), batch)

    # 2. forward+loss, in-jit reps
    @jax.jit
    def fwd_reps(params, batch):
        def body(i, acc):
            out = nbvh.apply(params, batch.inputs + acc * 0, net_config,
                             compute_dtype=jnp.bfloat16)
            total, _ = shell_losses(out, batch)
            return acc + total
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    t = timeit(fwd_reps, state.params, batch) / R
    print(f"2. forward+loss        : {t*1e3:8.2f} ms/step  ({B/t/1e6:6.2f} Mseg/s)")

    # 3. grad + optimizer on fixed batch, in-jit reps (chained via params)
    opt = make_optimizer(tcfg)

    @jax.jit
    def grad_reps(state, batch):
        def body(i, st):
            params, opt_state = st
            def loss(p):
                out = nbvh.apply(p, batch.inputs, net_config,
                                 compute_dtype=jnp.bfloat16)
                return shell_losses(out, batch)[0]
            grads = jax.grad(loss)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state
        return jax.lax.fori_loop(0, R, body, (state.params, state.opt_state))

    t = timeit(grad_reps, state, batch) / R
    print(f"3. grad+optimizer      : {t*1e3:8.2f} ms/step  ({B/t/1e6:6.2f} Mseg/s)")

    # 4. full production step, one dispatch per step
    step_fn = make_train_step(tcfg, net_config, gt, outer, inner, omin, inv,
                              radius, donate=False, global_row=grow)
    st = state

    def full(state, key):
        s, m = step_fn(state, key)
        return m["total"]

    t = timeit(full, st, key)
    print(f"4. full step (1/disp)  : {t*1e3:8.2f} ms/step  ({B/t/1e6:6.2f} Mseg/s)")

    # 5. full step scanned R-per-dispatch
    @jax.jit
    def scan_steps(state, key):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            b = sample_segment_batch(sub, gt, outer, inner, omin, inv, B,
                                     radius, tcfg.segments_per_ray, grow)
            def loss(p):
                out = nbvh.apply(p, b.inputs, net_config,
                                 compute_dtype=jnp.bfloat16)
                return shell_losses(out, b)[0]
            grads = jax.grad(loss)(st.params)
            updates, opt_state = opt.update(grads, st.opt_state, st.params)
            from neural_renderer_tpu.train.trainer import TrainState
            st = TrainState(optax.apply_updates(st.params, updates),
                            opt_state, st.step + 1)
            return (st, k), None
        (st, _), _ = jax.lax.scan(body, (state, key), None, length=R)
        return st.step

    t = timeit(scan_steps, st, key) / R
    print(f"5. full step (scan {R:3d}): {t*1e3:8.2f} ms/step  ({B/t/1e6:6.2f} Mseg/s)")


if __name__ == "__main__":
    main()

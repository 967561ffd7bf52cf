"""Decompose the training backward pass (VERDICT r2 item 3, continued).

profile_train_step.py showed grad+optimizer = 34 ms of the 43 ms step at
batch 16k (sampler 8, forward 6.6). This script answers:
  * does the grad step scale with batch (fixed overhead) or linearly
    (compute-bound)?
  * which param group's backward dominates: hash tables (scatter-add) or
    MLP (matmuls)?
  * corrected scan-chained full step (params returned -> no DCE).

Usage: python scripts/profile_train_backward.py [config]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from neural_renderer_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import optax

from neural_renderer_tpu.config import load_config
from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.scene.scene import Scene
from neural_renderer_tpu.train import (TrainConfig, init_train_state,
                                       scene_global_row, segment_domain)
from neural_renderer_tpu.train.dataset import sample_segment_batch
from neural_renderer_tpu.train.losses import shell_losses
from neural_renderer_tpu.train.trainer import TrainState, make_optimizer


def timeit(fn, *args, n=3):
    fn(*args)
    outs = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, outs)
    t0 = time.monotonic()
    for _ in range(n):
        outs = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, outs)
    return (time.monotonic() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="configs/sphere/sphere_lane.json")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    cfg = load_config(args.config)
    scene = Scene.from_config(cfg, sphere_fallback=False)
    net_config = nbvh.NbvhConfig(
        log2_hashmap_size=cfg.neural_network.log2_hashmap_size,
        base_resolution=cfg.neural_network.base_resolution,
        grid_type=cfg.neural_network.grid_type,
        lane_sublanes=cfg.neural_network.lane_sublanes,
        lane_entry_pack=cfg.neural_network.lane_entry_pack)
    tcfg = TrainConfig()
    gt = scene.original_mesh.to_arrays()
    outer = scene.outer_shell.to_arrays()
    inner = scene.inner_shell.to_arrays()
    omin, inv, radius = segment_domain(scene)
    grow = scene_global_row(scene)
    state = init_train_state(tcfg, net_config)
    opt = make_optimizer(tcfg)
    key = jax.random.PRNGKey(0)
    R = args.reps

    def grad_reps_fn(B, which):
        # which: "all" | "mlp" | "tables"
        @jax.jit
        def run(state, batch):
            def body(i, st):
                params, opt_state = st
                def loss(p):
                    if which == "mlp":
                        p = {**p, "lane": jax.tree_util.tree_map(
                            jax.lax.stop_gradient, p["lane"])}
                    elif which == "tables":
                        p = {**p, "mlp": jax.tree_util.tree_map(
                            jax.lax.stop_gradient, p["mlp"])}
                    out = nbvh.apply(p, batch.inputs, net_config,
                                     compute_dtype=jnp.bfloat16)
                    return shell_losses(out, batch)[0]
                grads = jax.grad(loss)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state
            return jax.lax.fori_loop(0, R, body, (state.params, state.opt_state))
        return run

    for B in (16384, 65536, 262144):
        batch = jax.jit(lambda k: sample_segment_batch(
            k, gt, outer, inner, omin, inv, B, radius, 1, grow),
            static_argnums=())(key)
        batch = jax.tree_util.tree_map(lambda x: x.block_until_ready(), batch)
        row = [f"B={B:7d}"]
        for which in ("all", "mlp", "tables"):
            t = timeit(grad_reps_fn(B, which), state, batch) / R
            row.append(f"{which}: {t*1e3:7.2f} ms ({B/t/1e6:6.2f} Mseg/s)")
        print("  ".join(row))

    # Corrected full-step scan (params chained AND returned).
    B = 16384
    @jax.jit
    def scan_steps(state, key):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            b = sample_segment_batch(sub, gt, outer, inner, omin, inv, B,
                                     radius, 1, grow)
            def loss(p):
                out = nbvh.apply(p, b.inputs, net_config,
                                 compute_dtype=jnp.bfloat16)
                return shell_losses(out, b)[0]
            grads = jax.grad(loss)(st.params)
            updates, opt_state = opt.update(grads, st.opt_state, st.params)
            st = TrainState(optax.apply_updates(st.params, updates),
                            opt_state, st.step + 1)
            return (st, k), None
        (st, _), _ = jax.lax.scan(body, (state, key), None, length=R)
        return st
    t = timeit(scan_steps, state, key) / R
    print(f"full step scan x{R} (B=16384): {t*1e3:7.2f} ms/step "
          f"({B/t/1e6:6.2f} Mseg/s)")


if __name__ == "__main__" and "--fused" not in sys.argv:
    main()
    sys.exit(0)


def bench_fused():
    """Appended: fused Pallas fwd+bwd step throughput (run via
    python scripts/profile_train_backward.py --fused)."""
    cfg = load_config("configs/sphere/sphere_lane.json")
    scene = Scene.from_config(cfg, sphere_fallback=False)
    net_config = nbvh.NbvhConfig(
        log2_hashmap_size=cfg.neural_network.log2_hashmap_size,
        base_resolution=cfg.neural_network.base_resolution,
        grid_type=cfg.neural_network.grid_type,
        lane_sublanes=cfg.neural_network.lane_sublanes,
        lane_entry_pack=cfg.neural_network.lane_entry_pack)
    tcfg = TrainConfig()
    gt = scene.original_mesh.to_arrays()
    outer = scene.outer_shell.to_arrays()
    inner = scene.inner_shell.to_arrays()
    omin, inv, radius = segment_domain(scene)
    grow = scene_global_row(scene)
    state = init_train_state(tcfg, net_config)
    opt = make_optimizer(tcfg)
    key = jax.random.PRNGKey(0)
    R = 10
    from neural_renderer_tpu.ops.lane_grid_train_kernel import apply_train_fused
    from neural_renderer_tpu.train.dataset import sample_segment_batch as ssb

    for B in (16384, 65536, 262144):
        batch = jax.jit(lambda k: ssb(k, gt, outer, inner, omin, inv, B,
                                      radius, 1, grow))(key)
        batch = jax.tree_util.tree_map(lambda x: x.block_until_ready(), batch)

        # net-only: fused fwd+bwd+optimizer on a fixed batch
        @jax.jit
        def run_net(state, batch):
            def body(i, st):
                params, opt_state = st
                def loss(p):
                    out = apply_train_fused(p, batch.inputs, net_config)
                    return shell_losses(out, batch)[0]
                grads = jax.grad(loss)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state
            return jax.lax.fori_loop(0, R, body,
                                     (state.params, state.opt_state))
        t = timeit(run_net, state, batch) / R
        print(f"B={B:7d}  fused net-only: {t*1e3:7.2f} ms "
              f"({B/t/1e6:6.2f} Mseg/s)")

        # full step: sampler + fused grad + optimizer, chained in-jit
        @jax.jit
        def run_full(state, key):
            def body(i, carry):
                params, opt_state, k = carry
                k, sub = jax.random.split(k)
                b = ssb(sub, gt, outer, inner, omin, inv, B, radius, 1, grow)
                def loss(p):
                    out = apply_train_fused(p, b.inputs, net_config)
                    return shell_losses(out, b)[0]
                grads = jax.grad(loss)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, k
            return jax.lax.fori_loop(0, R, body,
                                     (state.params, state.opt_state, key))
        t = timeit(run_full, state, key) / R
        print(f"B={B:7d}  fused full step: {t*1e3:7.2f} ms "
              f"({B/t/1e6:6.2f} Mseg/s)")


if "__main__" == __name__ and "--fused" in sys.argv:
    sys.argv.remove("--fused")
    bench_fused()
    sys.exit(0)

"""End-to-end training throughput, production dispatch style (one jitted
step per dispatch, async pipelining across steps) — the fori-chained
all-in-one jit measured pathological at B=262k (522 ms vs 69+66 of its
parts; XLA scheduling across the sampler/pallas boundary inside a loop).

Usage: python scripts/bench_train_e2e.py [--batch 262144] [--segments 1]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")
from neural_renderer_tpu.utils.compile_cache import enable
enable()

import jax

from neural_renderer_tpu.config import load_config
from neural_renderer_tpu.models import nbvh
from neural_renderer_tpu.scene.scene import Scene
from neural_renderer_tpu.train import (TrainConfig, init_train_state,
                                       make_train_step, scene_global_row,
                                       segment_domain)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--segments", type=int, default=1)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--config", default="configs/sphere/sphere_lane.json")
    ap.add_argument("--fused", default="auto")
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
                       segments_per_ray=args.segments,
                       fused_kernel=args.fused)
    state = init_train_state(tcfg, net_config)
    step = make_train_step(tcfg, net_config,
                           scene.original_mesh.to_arrays(),
                           scene.outer_shell.to_arrays(),
                           scene.inner_shell.to_arrays(),
                           *segment_domain(scene),
                           global_row=scene_global_row(scene))
    key = jax.random.PRNGKey(0)
    # warmup / compile
    key, sub = jax.random.split(key)
    state, m = step(state, sub)
    float(m["total"])
    t0 = time.monotonic()
    for _ in range(args.steps):
        key, sub = jax.random.split(key)
        state, m = step(state, sub)
    float(m["total"])  # sync
    dt = (time.monotonic() - t0) / args.steps
    print(f"B={args.batch} s={args.segments} fused={args.fused}: "
          f"{dt*1e3:.2f} ms/step ({args.batch/dt/1e6:.2f} Msegments/s)")


if __name__ == "__main__":
    main()

"""train CLI: online training of the shell network for a scene config.

The subsystem the reference's C++ runtime lacks (inference-only; SURVEY.md
caveats). Samples shell segments against the ground-truth mesh on-device,
optimizes with Adam, checkpoints with orbax, and exports the
reference-compatible flat FP16 blob so evaluate/viewer (ours or the CUDA
build) can load the result.

Usage: python -m neural_renderer_tpu.cli.train <config.json>
         [--steps N --batch-size B --lr LR --out weights.bin --ckpt-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()
    parser = argparse.ArgumentParser(description="Shell-network trainer")
    parser.add_argument("config")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=16384)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out", default="", help="flat FP16 blob output path")
    parser.add_argument("--ckpt-dir", default="", help="orbax checkpoint dir")
    parser.add_argument("--resume", default="", help="orbax checkpoint to resume")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lr-schedule", default="constant",
                        choices=["constant", "cosine"])
    parser.add_argument("--segments-per-ray", type=int, default=1,
                        help="march sampled rays N segments deep and train "
                             "on all of them (needed for non-convex shells, "
                             "e.g. configs/knot)")
    parser.add_argument("--log-every", type=int, default=100)
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel devices (segment batch sharded)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel devices (hash tables + MLP "
                             "matrices sharded)")
    parser.add_argument("--fused", default="auto",
                        choices=("auto", "on", "off"),
                        help="lane-grid fused Pallas train kernel. 'off' "
                             "uses the XLA masked-matmul gradient path — "
                             "needed for S=32 lane grids, whose unpacked "
                             "f32 tables blow the fused kernel's scoped "
                             "VMEM (21.5M > 16M)")
    args = parser.parse_args(argv)

    import jax

    from ..config import load_config
    from ..models import nbvh
    from ..scene.scene import Scene
    from ..train import (TrainConfig, export_reference_blob, init_train_state,
                         make_train_step, restore_checkpoint, save_checkpoint,
                         scene_global_row, segment_domain)

    cfg = load_config(args.config)
    scene = Scene.from_config(cfg, sphere_fallback=False)
    if scene.outer_shell.num_triangles == 0 or scene.original_mesh.num_triangles == 0:
        print("config must provide original mesh and outer shell", file=sys.stderr)
        return 1

    net_config = nbvh.NbvhConfig(
        log2_hashmap_size=cfg.neural_network.log2_hashmap_size,
        base_resolution=cfg.neural_network.base_resolution,
        grid_type=cfg.neural_network.grid_type,
        lane_sublanes=cfg.neural_network.lane_sublanes,
        lane_entry_pack=cfg.neural_network.lane_entry_pack)
    tcfg = TrainConfig(batch_size=args.batch_size, learning_rate=args.lr,
                       steps=args.steps, seed=args.seed,
                       log_every=args.log_every,
                       lr_schedule=args.lr_schedule,
                       segments_per_ray=args.segments_per_ray,
                       fused_kernel=args.fused)

    gt = scene.original_mesh.to_arrays()
    outer = scene.outer_shell.to_arrays()
    inner = scene.inner_shell.to_arrays()
    omin, inv_extent, radius = segment_domain(scene)

    state = (restore_checkpoint(args.resume, tcfg, net_config) if args.resume
             else init_train_state(tcfg, net_config))

    mesh = None
    if args.dp > 1 or args.tp > 1:
        from ..parallel import make_mesh, shard_train_state
        mesh = make_mesh(jax.devices(), dp=args.dp, tp=args.tp)
        state = shard_train_state(state, mesh)
        print(f"Device mesh: dp={args.dp} tp={args.tp} "
              f"({jax.devices()[0].platform})")

    step_fn = make_train_step(tcfg, net_config, gt, outer, inner,
                              omin, inv_extent, radius, mesh=mesh,
                              global_row=scene_global_row(scene))

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.monotonic()
    start_step = int(state.step)
    for i in range(start_step, args.steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub)
        if (i + 1) % args.log_every == 0 or i + 1 == args.steps:
            m = {k: float(v) for k, v in metrics.items()}
            rate = (i + 1 - start_step) * tcfg.batch_size / (time.monotonic() - t0)
            print(f"step {i+1}/{args.steps} loss={m['total']:.4f} "
                  f"presence={m['presence']:.4f} dist={m['distance']:.4f} "
                  f"normal={m['normal']:.4f} color={m['color']:.4f} "
                  f"({rate/1e6:.2f} Msegments/s)")
        if args.ckpt_dir and (i + 1) % tcfg.checkpoint_every == 0:
            path = save_checkpoint(args.ckpt_dir, state)
            print(f"checkpoint: {path}")

    if args.ckpt_dir:
        path = save_checkpoint(args.ckpt_dir, state)
        print(f"final checkpoint: {path}")
    if net_config.grid_type == "lane":
        # The reference blob format encodes the tcnn grid layout; lane-grid
        # networks ship as orbax checkpoints (checkpoint_path pointing at the
        # checkpoint dir is handled by the viewer/evaluate loaders).
        if not args.ckpt_dir:
            path = save_checkpoint(os.path.splitext(args.config)[0] + "_ckpt",
                                   state)
            print(f"final checkpoint: {path}")
    else:
        out = args.out or (os.path.splitext(args.config)[0] + "_weights.bin")
        export_reference_blob(out, state, net_config)
        print(f"exported flat FP16 blob: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""evaluate CLI: batch GT-vs-neural comparison with PSNR + FLIP.

(ref: /root/reference/src/evaluate.cu). Same contract: render ground truth
then neural at total_samples (8 spp per batch), save
comparison_output/{ground_truth,neural,flip_error}.png, print PSNR and
mean/max FLIP.

Usage: python -m neural_renderer_tpu.cli.evaluate <config.json>
       [--width W --height H --output DIR --batch-spp N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()
    parser = argparse.ArgumentParser(description="GT vs neural comparison renderer")
    parser.add_argument("config", nargs="?", default="configs/statuette_obj.json")
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--output", default="comparison_output")
    parser.add_argument("--batch-spp", type=int, default=8)
    parser.add_argument("--total-samples", type=int, default=None,
                        help="override config total_samples")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel devices: shard pixel stripes "
                             "over the first N jax devices (height must be "
                             "divisible by N)")
    parser.add_argument("--ckpt", default="",
                        help="weights to load (flat FP16 blob or orbax dir), "
                             "overriding the config's checkpoint_path")
    parser.add_argument("--no-additional", action="store_true",
                        help="disable the additional mesh in the NEURAL "
                             "pass. The GT pass never traces it (reference "
                             "parity: the GT branch is classic-mesh only, "
                             "cuda_renderer_neural.cu:2546), so configs "
                             "with a populated additional_mesh need this "
                             "for an apples-to-apples PSNR/FLIP gate")
    parser.add_argument("--host-loop", action="store_true",
                        help="per-batch host dispatch loop instead of the "
                             "in-jit fori accumulation (for A/B timing)")
    parser.add_argument("--chunk-batches", type=int, default=64,
                        help="batches chained in-jit per dispatch (progress "
                             "granularity; no recompile between chunks)")
    parser.add_argument("--profile", action="store_true",
                        help="print the per-kernel timing table (ns/ray + "
                             "Mrays, the PROFILE_KERNELS categories) after "
                             "each pass — re-runs stages separately, so it "
                             "adds compile + measurement time")
    args = parser.parse_args(argv)

    print("=== Comparison Renderer ===")

    from ..config import load_config, matrix_to_camera_state, camera_basis_from_state
    from ..metrics import compute_flip, compute_psnr, save_png
    from ..render import RenderBasis, Renderer
    from ..scene.scene import Scene
    from ..utils.progress import ProgressBar

    cfg = load_config(args.config)
    total_samples = args.total_samples or cfg.rendering.total_samples
    bounce_count = cfg.rendering.bounce_count

    os.makedirs(args.output, exist_ok=True)

    # Camera (evaluate.cu:137-144: position scaled by original mesh scale).
    pos, yaw, pitch = matrix_to_camera_state(cfg.camera.matrix)
    pos = pos * cfg.original_mesh.scale
    print(f"Loaded camera: pos=({pos[0]:.2f}, {pos[1]:.2f}, {pos[2]:.2f}), "
          f"yaw={yaw:.2f}, pitch={pitch:.2f}, fovY={cfg.camera.yfov:.2f}")

    scene = Scene.from_config(cfg, sphere_fallback=False)
    print(f"Loaded original mesh: {scene.original_mesh.num_triangles} triangles")
    print(f"Loaded inner shell: {scene.inner_shell.num_triangles} triangles")
    print(f"Loaded outer shell: {scene.outer_shell.num_triangles} triangles")

    renderer = Renderer(scene, cfg.neural_network)
    if args.dp > 1:
        import jax
        from ..parallel import make_mesh
        renderer.set_device_mesh(make_mesh(jax.devices(), dp=args.dp, tp=1))
        print(f"Pixel-stripe data parallelism over {args.dp} devices "
              f"({jax.devices()[0].platform})")
    renderer.set_constant_neural_color(cfg.material.use_constant_neural_color,
                                       cfg.material.constant_neural_color)
    if args.no_additional:
        renderer.set_use_additional_mesh(False)
    renderer.resize(args.width, args.height)
    renderer.set_bounce_count(bounce_count)
    renderer.set_lambert_view(False)
    renderer.set_envmap_rotation(cfg.environment.rotation)

    ckpt = args.ckpt or cfg.checkpoint_path
    if ckpt:
        if renderer.load_weights_from_file(ckpt):
            print(f"Loaded checkpoint: {ckpt}")
        else:
            print(f"Failed to load checkpoint: {ckpt}", file=sys.stderr)
            return 1

    fwd, right, up, fov = camera_basis_from_state(yaw, pitch, cfg.camera.yfov)
    renderer.set_camera_basis(RenderBasis(fwd, right, up, fov))

    def render_pass(label: str, neural: bool) -> np.ndarray:
        print(f"\n=== Rendering {label} ({total_samples} samples) ===")
        renderer.set_use_neural_query(neural)
        renderer.set_classic_mesh_index(0)
        renderer.reset_samples()

        bar = ProgressBar()
        if args.host_loop or total_samples % args.batch_spp != 0:
            # Legacy per-batch host loop: one dispatch per batch. On the
            # remote platform each dispatch pays a fixed floor, so this path
            # is only for uneven sample counts and A/B measurement.
            remaining = total_samples
            total_iters = (total_samples + args.batch_spp - 1) // args.batch_spp
            bar.begin(label, total_iters)
            it = 0
            img = None
            while remaining > 0:
                batch = min(remaining, args.batch_spp)
                renderer.set_samples_per_pixel(batch)
                img = renderer.render(pos)
                remaining -= batch
                it += 1
                bar.update(it)
            return img

        # In-jit accumulation: a fori_loop chains batches inside one dispatch
        # per chunk — the reference's per-batch loop (evaluate.cu:253-264) is
        # free under CUDA streams but dispatch-bound here (VERDICT r4).
        total_iters = total_samples // args.batch_spp
        bar.begin(label, total_iters)
        return renderer.render_accumulate(
            pos, total_samples, batch_spp=args.batch_spp,
            chunk_batches=args.chunk_batches,
            progress=lambda done, total: bar.update(done))

    def profile_pass(neural: bool):
        if not args.profile:
            return
        from ..render.profiler import profile_renderer
        print(profile_renderer(renderer, pos, neural).table())

    gt = render_pass("Ground truth", neural=False)
    save_png(os.path.join(args.output, "ground_truth.png"), gt)
    profile_pass(neural=False)

    neural = render_pass("Neural", neural=True)
    save_png(os.path.join(args.output, "neural.png"), neural)
    profile_pass(neural=True)

    psnr = compute_psnr(gt, neural)
    print("\n=== Metrics ===")
    print(f"PSNR: {psnr:.2f} dB")

    print("Computing FLIP error...")
    flip_path = os.path.join(args.output, "flip_error.png")
    # FLIP runs on the host CPU backend: it executes once per eval, and on
    # the remote-TPU platform its one-off CSF-convolution compile has twice
    # wedged the tunnel for 30+ min (rounds 4-5).
    mean_err, max_err = compute_flip(gt, neural, output_path=flip_path,
                                     device="cpu")
    print(f"FLIP max error: {max_err:.4f}")
    print(f"FLIP: {mean_err:.4f} (mean)")
    print("\nComparison complete.")
    return 0


if __name__ == "__main__":
    sys.exit(main())

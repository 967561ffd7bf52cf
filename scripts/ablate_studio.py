#!/usr/bin/env python
"""Studio normal-map ablation driver (VERDICT r3 item 1).

For each variant: train the lane-grid network on the studio scene, then run
the evaluate CLI (GT vs neural, --no-additional, 480x270 x 64 spp) and append
one result row to /tmp/studio_ablation.jsonl. Variants vary lane capacity
(S=16 vs S=32), step count, and normal-loss weight; the scene's ripple
normal map is the physically-plausible slope-1.2 fixture
(scripts/make_studio_scene.py).

Usage: python scripts/ablate_studio.py VARIANT
  VARIANT in: s16-4k | s32-4k | s16-24k | s32-24k | s32-12k
Each invocation is one train+eval (sequential TPU use; ~10-40 min).
"""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STUDIO = os.path.join(ROOT, "configs", "studio")
LOG = "/tmp/studio_ablation.jsonl"

VARIANTS = {
    # name: (sublanes, steps, batch, segments_per_ray, lr_schedule)
    "s16-4k": (16, 4000, 262144, 3, "cosine"),
    "s32-4k": (32, 4000, 262144, 3, "cosine"),
    "s32-12k": (32, 12000, 262144, 3, "cosine"),
    "s16-24k": (16, 24000, 262144, 3, "cosine"),
    "s32-24k": (32, 24000, 262144, 3, "cosine"),
    # smaller batch, more Adam steps at ~equal segment count (the knot
    # round-3 lesson: step count beats batch size at fixed data)
    "s16-12k-b64": (16, 12000, 65536, 3, "cosine"),
    "s32-12k-b64": (32, 12000, 65536, 3, "cosine"),
    "s16-24k-b64": (16, 24000, 65536, 3, "cosine"),
    "s32-24k-b64": (32, 24000, 65536, 3, "cosine"),
    # S=32 unpacked-f32 tables blow the fused kernel's scoped VMEM (21.5M >
    # 16M at any batch) — S=32 rows train on the XLA masked-matmul path.
    "s32-24k-b32": (32, 24000, 32768, 3, "cosine"),
    "s32-48k-b32": (32, 48000, 32768, 3, "cosine"),
}

XLA_PATH_VARIANTS = {"s32-4k", "s32-12k", "s32-24k", "s32-12k-b64",
                     "s32-24k-b64", "s32-24k-b32", "s32-48k-b32"}


def main():
    name = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"  # both|train|eval
    sublanes, steps, batch, segs, sched = VARIANTS[name]
    workdir = f"/tmp/studio_ablate_{name}"
    ckpt_dir = os.path.join(workdir, "ckpt")
    os.makedirs(workdir, exist_ok=True)

    with open(os.path.join(STUDIO, "studio_lane.json")) as f:
        cfg = json.load(f)
    cfg["neural_network"]["lane_sublanes"] = sublanes
    cfg["checkpoint_path"] = os.path.join(ckpt_dir, f"step_{steps}")
    # resolve asset paths relative to configs/studio
    for k, v in cfg["scene"].items():
        v["path"] = os.path.join(STUDIO, v["path"])
    cfg["environment"]["hdri_path"] = os.path.join(STUDIO, "sky.exr")
    var_json = os.path.join(workdir, "studio_var.json")
    with open(var_json, "w") as f:
        json.dump(cfg, f, indent=1)

    t0 = time.time()
    train_wall = 0.0
    final_loss = ""
    train_cmd = [sys.executable, "-m", "neural_renderer_tpu.cli.train",
                 var_json, "--steps", str(steps), "--batch-size", str(batch),
                 "--segments-per-ray", str(segs), "--lr-schedule", sched,
                 "--ckpt-dir", ckpt_dir, "--log-every", "200"]
    if name in XLA_PATH_VARIANTS:
        train_cmd += ["--fused", "off"]
    if mode in ("both", "train"):
        print("TRAIN:", " ".join(train_cmd), flush=True)
        r = subprocess.run(train_cmd, cwd=ROOT, capture_output=True, text=True)
        train_wall = time.time() - t0
        print(r.stdout[-2500:], r.stderr[-1500:], flush=True)
        if r.returncode != 0:
            sys.exit(1)
        loss_lines = re.findall(r"step \d+/\d+ loss=[^\n]*", r.stdout)
        final_loss = loss_lines[-1] if loss_lines else ""
    if mode == "train":
        print("train done (eval skipped)", flush=True)
        return

    t1 = time.time()
    eval_cmd = [sys.executable, "-m", "neural_renderer_tpu.cli.evaluate",
                var_json, "--width", "480", "--height", "270",
                "--batch-spp", "1", "--no-additional"]
    print("EVAL:", " ".join(eval_cmd), flush=True)
    r = subprocess.run(eval_cmd, cwd=ROOT, capture_output=True, text=True)
    eval_wall = time.time() - t1
    print(r.stdout[-2000:], r.stderr[-800:], flush=True)
    psnr = re.search(r"PSNR: ([0-9.]+) dB", r.stdout)
    flip = re.search(r"FLIP: ([0-9.]+) \(mean\)", r.stdout)
    row = {"variant": name, "sublanes": sublanes, "steps": steps,
           "batch": batch, "segments_per_ray": segs, "schedule": sched,
           "psnr_db": float(psnr.group(1)) if psnr else None,
           "flip_mean": float(flip.group(1)) if flip else None,
           "final_loss": final_loss,
           "train_wall_s": round(train_wall, 1),
           "eval_wall_s": round(eval_wall, 1),
           "mseg_per_s": round(steps * batch / train_wall / 1e6, 2)}
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Knot quality ablation driver (VERDICT r4 item 7: >=45 dB or a saturation
analysis naming the binding factor).

The shipped checkpoint (24k steps x 16384 x s=3, cosine) scores 40.32 dB /
0.0184 FLIP at 480x270 x 64 spp. Round-3 found large-batch runs LOSE quality
at equal segment count (2000 x 262k: 37.93 dB) — Adam step count binds, not
data volume. The sweep axes here: step count at the shipped batch, lane
capacity (S=32 rides the XLA masked-matmul path — unpacked-f32 tables exceed
the fused kernel's scoped VMEM), and segments-per-ray.

Usage: python scripts/ablate_knot.py VARIANT [train|eval|both]
Each invocation is one train+eval (sequential TPU use); rows append to
/tmp/knot_ablation.jsonl.
"""
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KNOT = os.path.join(ROOT, "configs", "knot")
LOG = "/tmp/knot_ablation.jsonl"

VARIANTS = {
    # name: (sublanes, steps, batch, segments_per_ray, lr_schedule)
    "s16-24k-b16": (16, 24000, 16384, 3, "cosine"),   # = shipped baseline
    "s16-48k-b16": (16, 48000, 16384, 3, "cosine"),   # steps axis
    "s16-24k-b64": (16, 24000, 65536, 3, "cosine"),   # batch axis @ equal steps
    "s16-48k-b64": (16, 48000, 65536, 3, "cosine"),
    "s32-24k-b16": (32, 24000, 16384, 3, "cosine"),   # capacity axis
    "s32-48k-b16": (32, 48000, 16384, 3, "cosine"),
    "s16-24k-s5": (16, 24000, 16384, 5, "cosine"),    # deeper segment cover
}

XLA_PATH_VARIANTS = {v for v in VARIANTS if v.startswith("s32")}


def main():
    name = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"  # both|train|eval
    sublanes, steps, batch, segs, sched = VARIANTS[name]
    workdir = f"/tmp/knot_ablate_{name}"
    ckpt_dir = os.path.join(workdir, "ckpt")
    os.makedirs(workdir, exist_ok=True)

    with open(os.path.join(KNOT, "knot_lane.json")) as f:
        cfg = json.load(f)
    cfg["neural_network"]["lane_sublanes"] = sublanes
    cfg["checkpoint_path"] = os.path.join(ckpt_dir, f"step_{steps}")
    for k, v in cfg["scene"].items():
        if isinstance(v, dict) and "path" in v:
            v["path"] = os.path.join(KNOT, v["path"])
    var_json = os.path.join(workdir, "knot_var.json")
    with open(var_json, "w") as f:
        json.dump(cfg, f, indent=1)

    t0 = time.time()
    train_wall = 0.0
    final_loss = ""
    train_cmd = [sys.executable, "-m", "neural_renderer_tpu.cli.train",
                 var_json, "--steps", str(steps), "--batch-size", str(batch),
                 "--segments-per-ray", str(segs), "--lr-schedule", sched,
                 "--ckpt-dir", ckpt_dir, "--log-every", "1000"]
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
                "--batch-spp", "1"]
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
           # batch = SEGMENTS per step (sample_segment_batch semantics) —
           # do not multiply by segs
           "mseg_per_s": round(steps * batch / max(train_wall, 1e-9)
                               / 1e6, 2) if train_wall else None}
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

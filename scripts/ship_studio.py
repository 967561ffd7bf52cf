#!/usr/bin/env python
"""Ship a studio ablation checkpoint: copy it into configs/studio and point
studio_lane.json at it. Usage: python scripts/ship_studio.py VARIANT"""
import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STUDIO = os.path.join(ROOT, "configs", "studio")

sys.path.insert(0, os.path.join(ROOT, "scripts"))
from ablate_studio import VARIANTS  # noqa: E402


def main():
    name = sys.argv[1]
    sublanes, steps, *_ = VARIANTS[name]
    src = f"/tmp/studio_ablate_{name}/ckpt/step_{steps}"
    if not os.path.isdir(src):
        # checkpoints rescued into the repo (round 5) ship from there
        src = os.path.join(STUDIO, "ablate_rescue", f"{name}_step_{steps}")
    assert os.path.isdir(src), src
    dst_dir = os.path.join(STUDIO, "lane_ckpt")
    dst = os.path.join(dst_dir, f"step_{steps}")
    if os.path.isdir(dst_dir):
        shutil.rmtree(dst_dir)
    os.makedirs(dst_dir)
    shutil.copytree(src, dst)

    cfg_path = os.path.join(STUDIO, "studio_lane.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["checkpoint_path"] = f"lane_ckpt/step_{steps}"
    cfg["neural_network"]["lane_sublanes"] = sublanes
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)
        f.write("\n")
    print(f"shipped {name}: {dst} (S={sublanes}), config updated")


if __name__ == "__main__":
    main()

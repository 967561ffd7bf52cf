"""Generate the bundled example scene: a shelled sphere.

The reference's dbrt_data assets are not in the snapshot (SURVEY.md caveats),
so the repo ships a procedural stand-in with the same structure: an original
mesh enclosed between an inner and outer shell, plus the scene JSON in the
reference's config schema.

Usage: python scripts/make_example_scene.py [out_dir=configs/sphere]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_renderer_tpu.config import camera_state_to_matrix
from neural_renderer_tpu.scene.mesh_loader import generate_uv_sphere


def outward_sphere(stacks, slices, radius):
    m = generate_uv_sphere(stacks, slices, radius)
    m.indices = m.indices[:, [0, 2, 1]].copy()
    m.mark_dirty()
    return m


def write_obj(mesh, path):
    with open(path, "w") as f:
        for v in mesh.vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for n in mesh.normals:
            f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for a, b, c in mesh.indices.astype(int) + 1:
            f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "configs/sphere"
    os.makedirs(out, exist_ok=True)

    write_obj(outward_sphere(48, 96, 1.0), os.path.join(out, "original.obj"))
    write_obj(outward_sphere(24, 48, 0.85), os.path.join(out, "inner.obj"))
    write_obj(outward_sphere(24, 48, 1.15), os.path.join(out, "outer.obj"))

    matrix = camera_state_to_matrix(np.array([0.0, 0.0, 3.0]), -90.0, 0.0)
    config = {
        "scene": {
            "original_mesh": {"path": "original.obj"},
            "inner_shell": {"path": "inner.obj"},
            "outer_shell": {"path": "outer.obj"},
        },
        "checkpoint_path": "weights.bin",
        "environment": {"hdri_path": "", "rotation": 0.0, "strength": 1.0},
        "camera": {"matrix": [float(v) for v in matrix], "yfov": 0.9},
        "rendering": {"total_samples": 64, "bounce_count": 3,
                      "width": 480, "height": 270},
        "material": {"base_color": [0.8, 0.8, 0.8], "roughness": 0.6,
                     "metallic": 0.0, "specular": 0.3},
        "neural_network": {"log2_hashmap_size": 14, "base_resolution": 16,
                           "use_neural_query": True},
    }
    with open(os.path.join(out, "sphere.json"), "w") as f:
        json.dump(config, f, indent=2)
    print(f"wrote example scene to {out}/")


if __name__ == "__main__":
    main()

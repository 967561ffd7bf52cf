"""Generate the third bundled example scene: the full-feature "studio".

The sphere scene is the minimal configuration and the knot the geometric
stress test; this one exists to exercise every remaining feature path in a
single end-to-end image (VERDICT r2 "Missing" items 1-3 — the paths that
were implemented and unit-tested but never drove a full frame):

  * original mesh = glTF GLB torus with TWO primitives / materials:
    - half the torus: checkerboard baseColorTexture + a ripple normalTexture
      (per-triangle texture resolution inside the path tracer,
      mesh_intersection.cuh:109-152 semantics)
    - other half: constant red base color
    -> per-primitive material ranges (mesh_loader.cpp:466,:563) are live
  * a real HDR environment map, written as a PIZ-compressed EXR
    (scene.cu:204-243 / 289-316 parity: env sampling at every miss)
  * a populated additional_mesh (ground plane + side sphere, OBJ) -> the
    hybrid merge kernels (cuda_renderer_neural.cu:1128-1450) run for both
    camera and bounce rays
  * inner/outer shells = tube-radius-scaled tori (multi-segment march:
    a ray across the hole crosses the outer shell up to 4 times)

Usage: python scripts/make_studio_scene.py [out_dir=configs/studio]
"""

from __future__ import annotations

import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_renderer_tpu.config import camera_state_to_matrix
from neural_renderer_tpu.scene.exr_write import write_exr

MAJOR_R = 1.2


def torus_mesh(tube_r: float, nu: int, nv: int, u_range=(0.0, 2 * np.pi)):
    """Torus around the Y axis: u along the major circle (range selectable so
    halves can carry different materials), v around the tube. Returns
    (verts [N,3], normals [N,3], uvs [N,2], tris [M,3]) with exact normals.
    Full-range tori wrap in u; partial ranges leave an open seam (the two
    halves share seam vertices by construction so the union is watertight)."""
    full = abs(u_range[1] - u_range[0] - 2 * np.pi) < 1e-9
    nu_pts = nu if full else nu + 1
    u = np.linspace(u_range[0], u_range[1], nu_pts, endpoint=not full)
    u = np.where(np.isclose(u, 2 * np.pi), 0.0, u)  # exact seam match
    v = np.linspace(0.0, 2 * np.pi, nv, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")  # [nu_pts, nv]
    cx, sx = np.cos(uu), np.sin(uu)
    cr, sr = np.cos(vv), np.sin(vv)
    # Center circle in XZ plane; tube offset has a Y component.
    cx3 = np.stack([MAJOR_R * cx, np.zeros_like(cx), MAJOR_R * sx], -1)
    n3 = np.stack([cr * cx, sr, cr * sx], -1)
    verts = (cx3 + tube_r * n3).reshape(-1, 3)
    normals = n3.reshape(-1, 3)
    span = (u_range[1] - u_range[0]) / (2 * np.pi)
    uvs = np.stack([(uu - u_range[0]) / (u_range[1] - u_range[0]) * span * 4,
                    vv / (2 * np.pi)], -1).reshape(-1, 2)

    tris = []
    for i in range(nu if full else nu):
        i2 = (i + 1) % nu_pts if full else i + 1
        for j in range(nv):
            j2 = (j + 1) % nv
            a, b = i * nv + j, i * nv + j2
            c, d = i2 * nv + j, i2 * nv + j2
            # Outward winding: cross(e1, e2) must point along the analytic
            # tube normal n3, so FORWARD (front-facing) crossings are the
            # tracer's shell ENTRIES. The round-3 winding ([a,c,b]/[b,c,d])
            # faced inward, which silently inverted every shell segment the
            # studio sampler generated (entries at exits) — the real root of
            # the 19 dB "normal-map cliff" (BASELINE.md round 4).
            tris.append([a, b, c])
            tris.append([b, d, c])
    return (verts.astype(np.float32), normals.astype(np.float32),
            uvs.astype(np.float32), np.asarray(tris, np.uint32))


def checker_texture(size=256, tiles=8):
    y, x = np.mgrid[0:size, 0:size]
    c = ((x * tiles // size + y * tiles // size) % 2).astype(np.float32)
    a = np.array([0.82, 0.65, 0.35], np.float32)  # tan
    b = np.array([0.20, 0.35, 0.70], np.float32)  # blue
    img = a * (1 - c[..., None]) + b * c[..., None]
    return (img * 255 + 0.5).astype(np.uint8)


def ripple_normal_map(size=256, freq=12.0, slope=1.2):
    """Sinusoidal-height-field normal map: h = A·sin(2πf·u) (+ half-amp in v),
    encoded as tangent-space normals.

    `slope` is the MAX surface gradient |dh| — the physically meaningful
    knob. slope=1.2 tilts normals up to ~50° (a strong, clearly visible
    ripple; real-world asset territory). The round-3 fixture passed the
    HEIGHT amplitude (0.35) through ·2πf, giving slopes of ~26: normals a
    mean 86° off the geometric normal, spinning at freq 12 — an unphysical
    field no 8-level hash encoding (nor the reference's tcnn config,
    cuda_renderer_neural.cu:1635-1686) can represent, which capped the
    studio scene at 19 dB. That map is kept as `slope=26.4` (the stress
    variant) for the BASELINE.md ablation."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    dzdx = slope * np.cos(2 * np.pi * freq * x)
    dzdy = slope * np.cos(2 * np.pi * freq * y) * 0.5
    n = np.stack([-dzdx, -dzdy, np.ones_like(x)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return ((n * 0.5 + 0.5) * 255 + 0.5).astype(np.uint8)


def png_bytes(img: np.ndarray) -> bytes:
    import imageio.v3 as iio
    return iio.imwrite("<bytes>", img, extension=".png")


def write_glb(path: str):
    """Two-primitive torus GLB: textured half + constant-red half."""
    halves = [torus_mesh(0.45, 24, 24, (0.0, np.pi)),
              torus_mesh(0.45, 24, 24, (np.pi, 2 * np.pi))]
    tex_png = png_bytes(checker_texture())
    nrm_png = png_bytes(ripple_normal_map())

    blob = bytearray()
    views = []
    accessors = []
    prims = []

    def add_view(data: bytes):
        off = len(blob)
        blob.extend(data)
        blob.extend(b"\0" * (-len(blob) % 4))
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(data)})
        return len(views) - 1

    def add_accessor(view, ctype, count, atype, vmin=None, vmax=None):
        acc = {"bufferView": view, "componentType": ctype, "count": count,
               "type": atype}
        if vmin is not None:
            acc["min"] = vmin
            acc["max"] = vmax
        accessors.append(acc)
        return len(accessors) - 1

    for mi, (verts, normals, uvs, tris) in enumerate(halves):
        pv = add_view(verts.tobytes())
        nv = add_view(normals.tobytes())
        uvv = add_view(uvs.tobytes())
        iv = add_view(tris.astype(np.uint32).tobytes())
        pa = add_accessor(pv, 5126, len(verts), "VEC3",
                          verts.min(0).tolist(), verts.max(0).tolist())
        na = add_accessor(nv, 5126, len(normals), "VEC3")
        ua = add_accessor(uvv, 5126, len(uvs), "VEC2")
        ia = add_accessor(iv, 5125, tris.size, "SCALAR")
        prims.append({"attributes": {"POSITION": pa, "NORMAL": na,
                                     "TEXCOORD_0": ua},
                      "indices": ia, "material": mi})

    tex_view = add_view(tex_png)
    nrm_view = add_view(nrm_png)

    gltf = {
        "asset": {"version": "2.0", "generator": "make_studio_scene"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": prims}],
        "materials": [
            {"name": "checker",
             "pbrMetallicRoughness": {
                 "baseColorTexture": {"index": 0},
                 "roughnessFactor": 0.55, "metallicFactor": 0.0},
             "normalTexture": {"index": 1}},
            {"name": "red",
             "pbrMetallicRoughness": {
                 "baseColorFactor": [0.75, 0.12, 0.10, 1.0],
                 "roughnessFactor": 0.3, "metallicFactor": 0.0}},
        ],
        "textures": [{"source": 0}, {"source": 1}],
        "images": [{"bufferView": tex_view, "mimeType": "image/png"},
                   {"bufferView": nrm_view, "mimeType": "image/png"}],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": views,
        "accessors": accessors,
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(blob), 0x004E4942))
        f.write(bytes(blob))


def write_obj(path: str, verts, normals, tris):
    with open(path, "w") as f:
        f.write("# studio scene component\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for n in normals:
            f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
        for t in tris:
            a, b, c = (int(i) + 1 for i in t)
            f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")


def uv_sphere(center, radius, stacks=12, slices=18):
    vs, ns, ts = [], [], []
    for i in range(stacks + 1):
        phi = np.pi * i / stacks
        for j in range(slices):
            th = 2 * np.pi * j / slices
            n = np.array([np.sin(phi) * np.cos(th), np.cos(phi),
                          np.sin(phi) * np.sin(th)])
            vs.append(center + radius * n)
            ns.append(n)
    for i in range(stacks):
        for j in range(slices):
            j2 = (j + 1) % slices
            a, b = i * slices + j, i * slices + j2
            c, d = (i + 1) * slices + j, (i + 1) * slices + j2
            if i > 0:
                ts.append([a, b, c])
            if i < stacks - 1:
                ts.append([b, d, c])
    return np.asarray(vs, np.float32), np.asarray(ns, np.float32), \
        np.asarray(ts, np.int64)


def additional_mesh_obj(path: str):
    """Ground plane + a mirror-ball beside the torus (both OUTSIDE the
    shells -> resolved by the hybrid merge, never the neural march)."""
    pv = np.array([[-6, -0.75, -6], [6, -0.75, -6],
                   [6, -0.75, 6], [-6, -0.75, 6]], np.float32)
    pn = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    pt = np.array([[0, 2, 1], [0, 3, 2]], np.int64)
    sv, sn, st = uv_sphere(np.array([2.6, -0.15, 0.0]), 0.6)
    verts = np.concatenate([pv, sv])
    normals = np.concatenate([pn, sn])
    tris = np.concatenate([pt, st + 4])
    write_obj(path, verts, normals, tris)


def sky_exr(path: str):
    """Procedural HDR sky: horizon-to-zenith gradient + a bright sun disk,
    written PIZ-compressed (the format most published HDRIs use)."""
    h, w = 128, 256
    v = (np.arange(h) + 0.5) / h  # 0 = top
    theta = v * np.pi
    u = (np.arange(w) + 0.5) / w
    phi = u * 2 * np.pi
    t, p = np.meshgrid(theta, phi, indexing="ij")
    up = np.cos(t)
    zenith = np.array([0.35, 0.55, 0.95])
    horizon = np.array([0.95, 0.75, 0.55])
    ground = np.array([0.25, 0.22, 0.20])
    sky = horizon + (zenith - horizon) * np.clip(up, 0, 1)[..., None]
    img = np.where(up[..., None] >= 0, sky, ground).astype(np.float32)
    # Sun at elevation 45deg, azimuth 60deg.
    sun_dir = np.array([np.sin(np.pi / 4) * np.cos(np.pi / 3), np.cos(np.pi / 4),
                        np.sin(np.pi / 4) * np.sin(np.pi / 3)])
    dirs = np.stack([np.sin(t) * np.cos(p), np.cos(t), np.sin(t) * np.sin(p)], -1)
    cosang = dirs @ sun_dir
    img += np.clip((cosang - 0.9995) / 0.0005, 0, 1)[..., None] * \
        np.array([900.0, 800.0, 600.0], np.float32)
    img += np.clip(cosang, 0, 1)[..., None] ** 32 * \
        np.array([1.5, 1.2, 0.8], np.float32)
    write_exr(path, img.astype(np.float32), "piz")


def main(out_dir="configs/studio"):
    os.makedirs(out_dir, exist_ok=True)
    write_glb(os.path.join(out_dir, "torus.glb"))
    for name, tube_r in [("inner", 0.30), ("outer", 0.62)]:
        verts, normals, _, tris = torus_mesh(tube_r, 20, 20)
        write_obj(os.path.join(out_dir, f"{name}.obj"), verts, normals, tris)
    additional_mesh_obj(os.path.join(out_dir, "extra.obj"))
    sky_exr(os.path.join(out_dir, "sky.exr"))

    cam_pos = np.array([0.2, 1.7, 3.4])
    look = -cam_pos / np.linalg.norm(cam_pos)  # toward origin
    # camera_state_to_matrix convention: forward =
    # (cos p cos y, sin p, cos p sin y) -> yaw = atan2(z, x).
    yaw = np.degrees(np.arctan2(look[2], look[0]))
    pitch = np.degrees(np.arcsin(look[1]))
    matrix = camera_state_to_matrix(cam_pos, float(yaw), float(pitch))

    base = {
        "scene": {
            "original_mesh": {"path": "torus.glb"},
            "inner_shell": {"path": "inner.obj"},
            "outer_shell": {"path": "outer.obj"},
            "additional_mesh": {"path": "extra.obj"},
        },
        "environment": {"hdri_path": "sky.exr", "rotation": 0.0,
                        "strength": 1.0},
        "camera": {"matrix": [float(x) for x in matrix],
                   "yfov": 1.047198},
        "rendering": {"total_samples": 64, "bounce_count": 3,
                      "width": 480, "height": 270},
        "material": {"base_color": [0.62, 0.62, 0.60], "roughness": 0.55},
    }
    lane = dict(base)
    lane["checkpoint_path"] = "lane_ckpt/step_4000"
    lane["neural_network"] = {
        "log2_hashmap_size": 14, "base_resolution": 16,
        "use_neural_query": True, "grid_type": "lane",
        "lane_sublanes": 16, "lane_entry_pack": 2,
    }
    with open(os.path.join(out_dir, "studio.json"), "w") as f:
        json.dump(base, f, indent=2)
    with open(os.path.join(out_dir, "studio_lane.json"), "w") as f:
        json.dump(lane, f, indent=2)
    print(f"studio scene written to {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:])

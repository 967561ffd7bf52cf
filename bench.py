"""Benchmark: neural-render throughput at 1080p on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: Mrays/s for the neural render path (multi-segment shell march +
hash-grid/SH/MLP inference + Disney bounce integration) at 1920x1080, the
reference's headline workload (BASELINE.md). Rays counted like the
reference's profiler: width * height * spp per frame (KernelTimings.rayCount,
cuda_renderer_neural.h:37-66).

Baseline: the reference publishes no numbers (BASELINE.json `published: {}`);
per BASELINE.md the self-relative target is >= 10x the CPU Mrays/s of this
same pipeline. vs_baseline = tpu_mrays / (10 * cpu_mrays) measured on a
scaled-down CPU run of the identical program (rays/sec is resolution-
independent for this masked pipeline).

Env knobs: BENCH_WIDTH/BENCH_HEIGHT/BENCH_SPP/BENCH_BOUNCES/BENCH_FRAMES,
BENCH_SKIP_CPU=1 to skip the CPU baseline measurement,
BENCH_GRID=lane|tcnn (encoding variant; lane = TPU-native fused kernel,
tcnn = reference-checkpoint-compatible layout),
BENCH_ADDITIONAL_TRIS=N (hybrid additional mesh with ~N triangles; N>16384
exercises the two-level clustered trace every frame).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np


def build_scene():
    from neural_renderer_tpu.scene.mesh_loader import generate_uv_sphere

    def outward(stacks, slices, r):
        m = generate_uv_sphere(stacks, slices, r)
        m.indices = m.indices[:, [0, 2, 1]].copy()
        m.mark_dirty()
        return m

    if os.environ.get("BENCH_SCENE", "sphere") == "knot":
        # Stress scene (configs/knot, scripts/make_knot_scene.py): 65k-tri
        # trefoil tube between non-convex 9.2k-tri shells — clustered
        # streaming trace + genuinely multi-segment marches.
        from neural_renderer_tpu.scene.mesh_loader import load_mesh_auto
        base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "configs", "knot")
        original = load_mesh_auto(os.path.join(base, "original.obj"))
        inner = load_mesh_auto(os.path.join(base, "inner.obj"))
        outer = load_mesh_auto(os.path.join(base, "outer.obj"))
        return original, inner, outer, None

    # Shelled-sphere benchmark scene: the dbrt_data assets are not in the
    # snapshot (SURVEY.md caveats), so the workload is synthetic but
    # structurally identical: original mesh between an inner/outer shell.
    original = outward(48, 96, 1.0)
    inner = outward(24, 48, 0.85)
    outer = outward(24, 48, 1.15)

    additional = None
    add_tris = int(os.environ.get("BENCH_ADDITIONAL_TRIS", "0"))
    if add_tris > 0:
        # Hybrid-path workload: a large uncompressed mesh traced alongside
        # the shell march every frame (traceAdditionalMesh* kernels; above
        # 16384 tris this exercises the two-level clustered trace).
        stacks = max(4, int((add_tris / 4) ** 0.5))
        m = outward(stacks, 2 * stacks, 0.45)
        verts = m.vertices.copy()
        verts[:, 0] += 1.8  # beside the shelled object, in view
        m.vertices = verts
        m.mark_dirty()
        additional = m
    return original, inner, outer, additional


def make_frame_fn(device, width, height, spp, bounces, compute_dtype):
    import jax
    import jax.numpy as jnp

    from neural_renderer_tpu.models import nbvh
    from neural_renderer_tpu.render.neural_frame import render_neural_frame
    from neural_renderer_tpu.render.neural_march import NeuralContext
    from neural_renderer_tpu.render.params import RenderParams
    from neural_renderer_tpu.scene.envmap import EnvironmentMap
    from neural_renderer_tpu.scene.materials import Material
    from neural_renderer_tpu.scene.mesh import Mesh

    original, inner, outer, additional = build_scene()

    put = lambda tree: jax.device_put(tree, device)
    outer_a = put(outer.to_arrays())
    inner_a = put(inner.to_arrays())
    use_additional = additional is not None
    add_a = put((additional or Mesh()).to_arrays())
    env = put(EnvironmentMap().to_arrays())

    grid = os.environ.get("BENCH_GRID", "lane")
    # Default S=16: the shipped flagship configuration (sphere_lane.json,
    # 51.5 dB GT-vs-neural) — the scored headline measures what users get.
    # S=8 pack=2 runs ~3% faster at 1/2 the table capacity.
    lane_s = int(os.environ.get("BENCH_LANE_SUBLANES", "16"))
    cfg = (nbvh.NbvhConfig(grid_type="lane", lane_sublanes=lane_s)
           if grid == "lane" else nbvh.NbvhConfig())
    net_params = put(nbvh.init_params(jax.random.PRNGKey(0), cfg))
    ctx = NeuralContext(outer=outer_a, inner=inner_a, net_params=net_params,
                        config=cfg)

    omin, omax = outer.bounds()
    knot = os.environ.get("BENCH_SCENE", "sphere") == "knot"
    params = RenderParams.make(
        width=width, height=height, samples_per_pixel=spp, max_bounces=bounces,
        cam_pos=[0.0, 0.0, 7.0 if knot else 3.0],
        cam_forward=[0.0, 0.0, -1.0],
        cam_right=[1.0, 0.0, 0.0], cam_up=[0.0, 1.0, 0.0], fov_y=0.9,
        material=Material.default(),
        scene_scale=float(np.linalg.norm(omax - omin)) if knot else 2.0,
        outer_shell_min=omin, outer_shell_inv_extent=1.0 / (omax - omin))
    params = put(params)

    if os.environ.get("BENCH_MODE", "neural") == "gt":
        # Ground-truth branch: classic path trace of the original mesh
        # (intersectGroundTruthKernel + bounce loop semantics).
        from neural_renderer_tpu.render.pathtrace import render_gt_frame
        orig_a = put(original.to_arrays())
        gt_frame = jax.jit(render_gt_frame, donate_argnums=(3,))

        def run(accum, sample_offset):
            p = dataclasses.replace(params,
                                    sample_offset=jnp.uint32(sample_offset))
            return gt_frame(orig_a, env, p, accum)

        accum0 = jax.device_put(jnp.zeros((3, width * height), jnp.float32),
                                device)
        return run, accum0

    frame = jax.jit(
        render_neural_frame,
        static_argnames=("use_additional", "compute_dtype"),
        donate_argnums=(4,))

    def run(accum, sample_offset):
        p = dataclasses.replace(params, sample_offset=jnp.uint32(sample_offset))
        return frame(ctx, add_a, env, p, accum, use_additional=use_additional,
                     compute_dtype=compute_dtype)

    accum0 = jax.device_put(jnp.zeros((3, width * height), jnp.float32), device)
    return run, accum0


def _sync(x):
    """Force completion with a tiny scalar readback.

    jax.block_until_ready is not a reliable barrier on the remote 'axon'
    platform and a bulk np.asarray would time the network tunnel instead of
    the device; an on-device reduction + scalar transfer is both."""
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.int32)))


def measure(device, width, height, spp, bounces, frames, compute_dtype,
            repeats=1):
    """Return a list of Mrays/s samples, one per repeat of the timed block.

    Repeats exist because the axon host is time-shared: a single timed run
    cannot distinguish a code regression from host/tunnel contention
    (VERDICT r4). The caller reports median + spread."""
    run, accum = make_frame_fn(device, width, height, spp, bounces, compute_dtype)
    # Warmup / compile.
    img, accum = run(accum, 0)
    _sync(img)

    samples = []
    offset = spp
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(frames):
            img, accum = run(accum, offset)
            offset += spp
        _sync(img)
        dt = time.perf_counter() - t0
        rays = width * height * spp * frames
        samples.append(rays / dt / 1e6)
    return samples


def _cpu_baseline_mrays(bounces: int) -> float | None:
    """CPU Mrays/s of the same pipeline, measured in a subprocess (the CPU
    and TPU backends don't coexist reliably in one process here) and cached
    in bench_cpu_baseline.json — the pipeline is resolution-independent in
    rays/s, so a small frame suffices and the cache spares the driver a
    multi-minute single-core XLA compile every round."""
    if os.environ.get("BENCH_SKIP_CPU") == "1":
        return None
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_cpu_baseline.json")
    if os.path.exists(cache):
        try:
            with open(cache) as f:
                data = json.load(f)
            if data.get("bounces") == bounces:
                return float(data["cpu_mrays"])
        except (OSError, ValueError, KeyError):
            pass
    import subprocess
    code = (
        "import os,json,sys;"
        "os.environ['JAX_PLATFORM_NAME']='cpu';"
        "import jax;jax.config.update('jax_platforms','cpu');"
        "sys.path.insert(0, %r);"
        "import bench,jax.numpy as jnp;"
        "m=bench.measure(jax.devices('cpu')[0],192,108,1,%d,1,jnp.float32)[0];"
        "print(json.dumps({'cpu_mrays':m}))"
    ) % (os.path.dirname(os.path.abspath(__file__)), bounces)
    try:
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             timeout=3600, text=True)
        line = out.stdout.strip().splitlines()[-1]
        mrays = float(json.loads(line)["cpu_mrays"])
        with open(cache, "w") as f:
            json.dump({"cpu_mrays": mrays, "bounces": bounces,
                       "workload": "192x108 spp1 neural"}, f)
        return mrays
    except Exception as e:  # pragma: no cover
        print(f"CPU baseline failed: {e}", file=sys.stderr)
        return None


def main():
    from neural_renderer_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()  # no-op on the remote TPU unless NR_COMPILE_CACHE_TPU=1
    import jax

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    spp = int(os.environ.get("BENCH_SPP", 1))
    bounces = int(os.environ.get("BENCH_BOUNCES", 3))
    frames = int(os.environ.get("BENCH_FRAMES", 4))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))

    import jax.numpy as jnp

    accel = jax.devices()[0]
    samples = measure(accel, width, height, spp, bounces, frames, jnp.bfloat16,
                      repeats=repeats)
    samples.sort()
    mrays = samples[len(samples) // 2] if len(samples) % 2 else (
        0.5 * (samples[len(samples) // 2 - 1] + samples[len(samples) // 2]))

    vs_baseline = None
    cpu_mrays = _cpu_baseline_mrays(bounces)
    if cpu_mrays:
        vs_baseline = mrays / (10.0 * cpu_mrays)
    if vs_baseline is None:
        vs_baseline = 1.0

    grid = os.environ.get("BENCH_GRID", "lane")
    add_tris = int(os.environ.get("BENCH_ADDITIONAL_TRIS", "0"))
    extra = f"+add{add_tris}" if add_tris else ""
    if os.environ.get("BENCH_SCENE", "sphere") != "sphere":
        extra += f" {os.environ['BENCH_SCENE']}"
    mode = "gt" if os.environ.get("BENCH_MODE", "neural") == "gt" else "neural"
    print(json.dumps({
        "metric": f"{mode} render Mrays/s @ {width}x{height} spp{spp} b{bounces} {grid}{extra} ({accel.platform})",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(vs_baseline, 3),
        # Median of BENCH_REPEATS timed blocks; min/max expose time-shared
        # host contention that a single run cannot (VERDICT r4).
        "repeats": len(samples),
        "min": round(samples[0], 3),
        "max": round(samples[-1], 3),
    }))


if __name__ == "__main__":
    main()

"""viewer CLI: interactive / headless progressive renderer.

(ref: /root/reference/src/viewer.cu). The GLFW+OpenGL+ImGui stack has no TPU
analog, so the viewer is re-thought (SURVEY.md §2.3): the render loop +
progressive accumulation + camera controller + runtime toggles are identical,
but display is either
  * interactive: a matplotlib window with key bindings (WASD fly camera,
    arrow-key look, toggles for neural query / lambert / denoiser / bounces /
    spp, just like the ImGui panel), or
  * headless: render N accumulation batches and write PNG frames — the mode
    that works over SSH and drives golden tests.

Runtime controls (interactive) — every reference ImGui control
(viewer.cu:320-590) has a key:
  w/a/s/d/q/e move, arrows look, shift faster
  n neural toggle, l lambert toggle, b/shift+b bounces -/+,
  p/shift+p spp -/+, x denoiser toggle, m classic-mesh cycle
  (original/inner/outer), r/shift+r envmap rotation -/+15deg,
  v/shift+v env strength x0.8/x1.25, g direct-env-color toggle,
  f/shift+f FOV -/+0.05 rad, t per-kernel timing table (ns/ray + Mrays),
  i mesh/BVH/network memory stats, c print camera matrix JSON
  (shift+c exports camera_export.json), o save PNG,
  u pause/resume live training (with --train-steps), h help, esc quit

Train-while-render (--train-steps N): the online-training mode SURVEY.md §7
step 9 plans and the reference's inference-only runtime lacks — N optimizer
steps run between frames (on-device segment sampling against the GT mesh,
train/trainer.py) and the refreshed weights are pushed into the renderer;
the weights-version key resets neural accumulation so every frame reflects
the latest network. Warm-starts from the config checkpoint when present.

Usage: python -m neural_renderer_tpu.cli.viewer <config.json>
         [--headless N] [--output DIR] [--width W --height H]
         [--train-steps N --train-batch B --train-lr LR
          --train-ckpt-dir DIR --train-resume CKPT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


class MotionScaler:
    """Interactive-preview resolution control (viewer.cu:258-318 parity in
    spirit): while the camera moves, render at 1/`drop` resolution (rays
    fall by drop^2 — e.g. 16x at drop 4, lifting a ~4 fps full-res scene to
    interactive rates); `hold` seconds after the last motion, restore full
    resolution and let progressive accumulation refine. Two fixed sizes
    mean exactly two jit variants — no recompiles while flying."""

    def __init__(self, width: int, height: int, drop: int = 4,
                 hold: float = 0.25):
        self.full = (width, height)
        drop = max(1, int(drop))
        # Keep the preview dimensions even so pixel-id math stays aligned.
        self.preview = self.full if drop == 1 else (
            max(2, width // drop // 2 * 2), max(2, height // drop // 2 * 2))
        self.hold = hold
        self._last_motion = -1e30

    def update(self, moving: bool, now: float) -> tuple[int, int]:
        if moving:
            self._last_motion = now
        if now - self._last_motion < self.hold and self.preview != self.full:
            return self.preview
        return self.full

    def upscale(self, img: np.ndarray) -> np.ndarray:
        """Nearest-upscale a preview frame to full display size."""
        if img.shape[0] == self.full[1]:
            return img
        # Index-map nearest upscale: exact full-size output even when the
        # full dims are not integer multiples of the preview dims.
        ys = (np.arange(self.full[1]) * img.shape[0]) // self.full[1]
        xs = (np.arange(self.full[0]) * img.shape[1]) // self.full[0]
        return img[ys[:, None], xs[None, :]]


def build_renderer(args):
    from ..config import (camera_basis_from_state, load_config,
                          matrix_to_camera_state)
    from ..render import RenderBasis, Renderer
    from ..scene.scene import Scene
    from .input_controller import CameraState, InputController

    cfg = load_config(args.config)
    scene = Scene.from_config(cfg, sphere_fallback=True)
    print(f"Loaded original mesh: {scene.original_mesh.num_triangles} triangles")

    renderer = Renderer(scene, cfg.neural_network)
    if getattr(args, "dp", 1) > 1:
        import jax
        from ..parallel import make_mesh
        renderer.set_device_mesh(make_mesh(jax.devices(), dp=args.dp, tp=1))
        print(f"Pixel-stripe data parallelism over {args.dp} devices")
    width = args.width or cfg.rendering.width
    height = args.height or cfg.rendering.height
    renderer.resize(width, height)
    renderer.set_bounce_count(cfg.rendering.bounce_count)
    renderer.set_samples_per_pixel(args.spp)
    renderer.set_use_neural_query(cfg.neural_network.use_neural_query)
    renderer.set_envmap_rotation(cfg.environment.rotation)
    renderer.set_constant_neural_color(cfg.material.use_constant_neural_color,
                                       cfg.material.constant_neural_color)
    ckpt = getattr(args, "ckpt", "") or cfg.checkpoint_path
    if ckpt:
        if not os.path.exists(ckpt):
            print(f"Checkpoint not found: {ckpt}", file=sys.stderr)
            if getattr(args, "ckpt", ""):
                raise SystemExit(1)  # explicit --ckpt must not be ignored
        elif renderer.load_weights_from_file(ckpt):
            print(f"Loaded checkpoint: {ckpt}")
        elif getattr(args, "ckpt", ""):
            raise SystemExit(1)

    pos, yaw, pitch = matrix_to_camera_state(cfg.camera.matrix)
    pos = pos * cfg.original_mesh.scale
    camera = CameraState(position=pos, yaw=yaw, pitch=pitch,
                         fov_y=cfg.camera.yfov)
    controller = InputController(camera)
    # Auto move speed = 0.15 x bbox diagonal (viewer.cu:174-198).
    if cfg.camera.move_speed > 0:
        controller.set_move_speed(cfg.camera.move_speed)
    else:
        bmin, bmax = scene.original_mesh.bounds()
        controller.set_move_speed(0.15 * float(np.linalg.norm(bmax - bmin)) or 1.0)

    def current_basis():
        from ..render import RenderBasis
        b = controller.basis
        return RenderBasis(b.forward, b.right, b.up, controller.camera.fov_y)

    return cfg, renderer, controller, current_basis


class LiveTrainer:
    """Train-while-render: runs `steps_per_frame` optimizer steps between
    frames and pushes the params into the renderer. Dataset, losses, and
    optimizer are the train CLI's (train/trainer.py); warm-starts from the
    renderer's current weights (the config checkpoint) unless `resume` names
    an orbax train-state checkpoint."""

    def __init__(self, scene, renderer, steps_per_frame: int,
                 batch_size: int = 16384, lr: float = 1e-3,
                 resume: str = "", seed: int = 0, warm_start: bool = False):
        import jax

        from ..train import (TrainConfig, init_train_state, make_optimizer,
                             make_train_step, restore_checkpoint,
                             scene_global_row, segment_domain)

        self.renderer = renderer
        self.steps_per_frame = steps_per_frame
        self.enabled = True
        self.last_metrics: dict = {}
        tcfg = TrainConfig(batch_size=batch_size, learning_rate=lr)

        if resume:
            self.state = restore_checkpoint(resume, tcfg, renderer.net_config)
        else:
            self.state = init_train_state(tcfg, renderer.net_config)
            if warm_start:
                # Fine-tune the weights currently being viewed (fresh
                # optimizer state over the loaded params).
                self.state = self.state._replace(
                    params=renderer.net_params,
                    opt_state=make_optimizer(tcfg).init(renderer.net_params))

        gt = scene.original_mesh.to_arrays()
        outer = scene.outer_shell.to_arrays()
        inner = scene.inner_shell.to_arrays()
        omin, inv_extent, radius = segment_domain(scene)
        # donate=False: the renderer keeps a live reference to state.params
        # between steps; donating them would delete the buffers under it.
        self.step_fn = make_train_step(
            tcfg, renderer.net_config, gt, outer, inner, omin, inv_extent,
            radius, donate=False, global_row=scene_global_row(scene))
        self.key = jax.random.PRNGKey(seed + 1)
        self._tcfg = tcfg

    def run(self) -> dict:
        """One frame's worth of training; returns the latest loss metrics."""
        import jax
        metrics = self.last_metrics
        for _ in range(self.steps_per_frame):
            self.key, sub = jax.random.split(self.key)
            self.state, metrics = self.step_fn(self.state, sub)
        self.last_metrics = {k: float(v) for k, v in metrics.items()}
        self.renderer.set_network_params(self.state.params)
        return self.last_metrics

    def save(self, ckpt_dir: str) -> str:
        from ..train import save_checkpoint
        return save_checkpoint(ckpt_dir, self.state)


def make_live_trainer(args, cfg, scene, renderer):
    """Build the LiveTrainer when --train-steps > 0 (None otherwise)."""
    if getattr(args, "train_steps", 0) <= 0:
        return None
    if (scene.original_mesh.num_triangles == 0
            or scene.outer_shell.num_triangles == 0):
        print("train-while-render needs an original mesh and outer shell; "
              "training disabled", file=sys.stderr)
        return None
    # Warm-start whenever weights were actually loaded into the renderer
    # (config checkpoint OR --ckpt override — the weights version counts
    # loads), unless an explicit train state is being resumed.
    warm = renderer._weights_version > 0 and not args.train_resume
    trainer = LiveTrainer(scene, renderer, args.train_steps,
                          batch_size=args.train_batch, lr=args.train_lr,
                          resume=args.train_resume, warm_start=warm)
    print(f"Live training: {args.train_steps} steps/frame, batch "
          f"{args.train_batch}" + (" (warm start)" if warm else ""))
    return trainer


def run_headless(args):
    cfg, renderer, controller, current_basis = build_renderer(args)
    os.makedirs(args.output, exist_ok=True)
    from ..metrics import save_png

    trainer = make_live_trainer(args, cfg, renderer.scene, renderer)
    renderer.set_camera_basis(current_basis())
    for i in range(args.headless):
        loss = ""
        if trainer is not None:
            m = trainer.run()
            loss = f", loss {m.get('total', float('nan')):.4f}"
        img = renderer.render(controller.camera.position)
        fps = 1.0 / max(renderer.last_frame_seconds, 1e-9)
        print(f"frame {i}: {renderer.accum_sample_count} spp accumulated, "
              f"{renderer.mrays_per_second:.1f} Mrays/s, {fps:.2f} fps{loss}")
        if args.save_sequence:
            save_png(os.path.join(args.output, f"frame_{i:04d}.png"), img)
    save_png(os.path.join(args.output, "viewer_final.png"),
             renderer.device_pixels())
    if trainer is not None and args.train_ckpt_dir:
        print(f"checkpoint: {trainer.save(args.train_ckpt_dir)}")
    return 0


def run_motion_bench(args):
    """Measured viewer interactivity (VERDICT r2-r4 ask): simulate the live
    GLFW loop (viewer.cu:258-318) without a display — orbit the camera for
    `--bench-motion` seconds at the MotionScaler preview resolution, then
    rest and accumulate to the config's total_samples at full resolution.
    Prints preview fps during motion, full-res fps, and rest-to-converged
    wall time. With --train-steps, training runs between motion frames and
    the steps/frame cadence is reported (train-while-render)."""
    cfg, renderer, controller, current_basis = build_renderer(args)
    width, height = renderer.width, renderer.height
    scaler = MotionScaler(width, height, drop=args.motion_drop)
    trainer = make_live_trainer(args, cfg, renderer.scene, renderer)
    pw, ph = scaler.preview

    # Warm up / compile both sizes once (outside the timed loops).
    renderer.set_camera_basis(current_basis())
    renderer.resize(pw, ph)
    renderer.render(controller.camera.position)
    renderer.resize(width, height)
    renderer.render(controller.camera.position)

    # --- motion phase: orbit, preview resolution, accumulation resets every
    # frame (settings key changes with the camera) ---------------------------
    import math
    pos0 = np.array(controller.camera.position, np.float64)
    radius = float(np.linalg.norm(pos0)) or 1.0
    renderer.resize(pw, ph)
    frames = 0
    t_end = time.perf_counter() + args.bench_motion
    t0 = time.perf_counter()
    frame_times = []
    while time.perf_counter() < t_end:
        ang = 0.2 * (time.perf_counter() - t0)
        pos = np.array([radius * math.sin(ang), pos0[1],
                        radius * math.cos(ang)])
        if trainer is not None:
            trainer.run()
        f0 = time.perf_counter()
        img = renderer.render(pos)
        frame_times.append(time.perf_counter() - f0)
        scaler.upscale(img)  # host-side cost of the preview path, counted
        frames += 1
    motion_wall = time.perf_counter() - t0
    fps = frames / motion_wall
    frame_times.sort()
    med = frame_times[len(frame_times) // 2] if frame_times else 0.0
    print(f"motion: {frames} frames in {motion_wall:.2f} s at {pw}x{ph} "
          f"(drop {args.motion_drop}) -> {fps:.2f} fps "
          f"(median frame {med * 1e3:.1f} ms, incl. pixel readback"
          + (f", {args.train_steps} train steps/frame" if trainer else "")
          + ")")

    # --- rest phase: full resolution, progressive accumulation to the
    # config sample count ----------------------------------------------------
    renderer.resize(width, height)
    renderer.reset_samples()
    total = cfg.rendering.total_samples
    t0 = time.perf_counter()
    img = renderer.render_accumulate(controller.camera.position, total,
                                     batch_spp=args.spp,
                                     chunk_batches=args.chunk_batches)
    rest_wall = time.perf_counter() - t0
    rays = width * height * total
    print(f"rest: {total} spp at {width}x{height} converged in "
          f"{rest_wall:.2f} s ({rays / rest_wall / 1e6:.3f} Mrays/s)")
    sfps = 1.0 / max(renderer.last_frame_seconds / max(total // args.spp, 1),
                     1e-9)
    print(f"full-res single-batch rate: {sfps:.2f} batches/s at spp "
          f"{args.spp}")
    from ..metrics import save_png
    os.makedirs(args.output, exist_ok=True)
    save_png(os.path.join(args.output, "bench_motion_final.png"), img)
    return 0


def profile_table(renderer, controller):
    """Per-kernel timing table (the PROFILE_KERNELS ImGui table,
    viewer.cu:520-590) for the current camera/settings."""
    from ..render.profiler import profile_renderer
    return profile_renderer(renderer, controller.camera.position,
                            renderer.use_neural_query).table()


def run_interactive(args):
    try:
        import matplotlib
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; use --headless", file=sys.stderr)
        return 1
    backend = matplotlib.get_backend().lower()
    # GUI backends are e.g. qtagg/tkagg/gtk4agg/macosx — plain file-output
    # backends can't open a window, so plt.show() would no-op and the
    # render loop would spin with nothing to close.
    if backend in ("agg", "pdf", "svg", "svgz", "ps", "eps", "cairo",
                   "template", "pgf") or "inline" in backend:
        print(f"no GUI backend (matplotlib is on {backend}) — "
              "use --headless N", file=sys.stderr)
        return 1

    cfg, renderer, controller, current_basis = build_renderer(args)
    from ..config import camera_state_to_matrix
    from ..metrics import save_png

    trainer = make_live_trainer(args, cfg, renderer.scene, renderer)
    pressed: set[str] = set()
    state = {"quit": False, "dirty": True}

    keymap = {"w": "w", "a": "a", "s": "s", "d": "d", "q": "q", "e": "e",
              " ": "space", "shift": "shift", "control": "ctrl"}

    def on_key(event):
        k = (event.key or "").lower()
        if k == "escape":
            state["quit"] = True
        elif k in keymap:
            pressed.add(keymap[k])
        elif k == "up":
            controller.apply_mouse_delta(0, 20)
        elif k == "down":
            controller.apply_mouse_delta(0, -20)
        elif k == "left":
            controller.apply_mouse_delta(-20, 0)
        elif k == "right":
            controller.apply_mouse_delta(20, 0)
        elif k == "n":
            renderer.set_use_neural_query(not renderer.use_neural_query)
        elif k == "l":
            renderer.set_lambert_view(not renderer.lambert_view)
        elif k == "x":
            renderer.set_denoise(not renderer.denoise)
        elif k == "b":
            renderer.set_bounce_count(max(0, renderer.bounce_count - 1))
        elif k == "shift+b":
            renderer.set_bounce_count(renderer.bounce_count + 1)
        elif k == "p":
            renderer.set_samples_per_pixel(max(1, renderer.samples_per_pixel - 1))
        elif k == "shift+p":
            renderer.set_samples_per_pixel(renderer.samples_per_pixel + 1)
        elif k in ("c", "shift+c"):
            m = camera_state_to_matrix(controller.camera.position,
                                       controller.camera.yaw,
                                       controller.camera.pitch)
            blob = json.dumps({"matrix": [float(v) for v in m],
                               "yfov": controller.camera.fov_y})
            if k == "shift+c":
                # File export, like the reference's NFD save dialog
                # (viewer.cu camera export-JSON).
                with open("camera_export.json", "w") as f:
                    f.write(blob)
                print("saved camera_export.json")
            else:
                print(blob)
        elif k == "o":
            save_png("viewer_capture.png", renderer.device_pixels())
        elif k == "m":
            renderer.set_classic_mesh_index((renderer.classic_mesh_index + 1) % 3)
        elif k == "r":
            renderer.set_envmap_rotation(renderer.envmap_rotation - 15.0)
        elif k == "shift+r":
            renderer.set_envmap_rotation(renderer.envmap_rotation + 15.0)
        elif k == "v":
            renderer.set_env_strength(renderer.env_strength * 0.8)
        elif k == "shift+v":
            renderer.set_env_strength(renderer.env_strength * 1.25)
        elif k == "g":
            renderer.set_direct_env_color(not renderer.use_direct_env_color,
                                          renderer.direct_env_color)
        elif k == "f":
            controller.camera.fov_y = max(0.1, controller.camera.fov_y - 0.05)
        elif k == "shift+f":
            controller.camera.fov_y = min(3.0, controller.camera.fov_y + 0.05)
        elif k == "u":
            if trainer is not None:
                trainer.enabled = not trainer.enabled
                print(f"training {'resumed' if trainer.enabled else 'paused'}")
        elif k == "t":
            print(profile_table(renderer, controller))
        elif k == "i":
            print(json.dumps(renderer.memory_stats(), indent=2))
        elif k == "h":
            print(__doc__)

    def on_release(event):
        k = (event.key or "").lower()
        if k in keymap:
            pressed.discard(keymap[k])

    fig, ax = plt.subplots(figsize=(10, 6))
    fig.canvas.mpl_connect("key_press_event", on_key)
    fig.canvas.mpl_connect("key_release_event", on_release)
    im = ax.imshow(np.zeros((renderer.height, renderer.width, 3), np.uint8))
    ax.axis("off")
    plt.ion()
    plt.show()

    scaler = MotionScaler(renderer.width, renderer.height,
                          drop=args.motion_drop)
    last = time.monotonic()
    while not state["quit"] and plt.fignum_exists(fig.number):
        now = time.monotonic()
        dt = now - last
        last = now
        if pressed:
            controller.apply_keys(pressed, dt)
        loss = ""
        if trainer is not None and trainer.enabled:
            m = trainer.run()
            loss = f" | loss {m.get('total', float('nan')):.4f}"
        renderer.set_camera_basis(current_basis())
        # Motion preview: drop resolution while flying, restore on rest
        # (progressive accumulation then refines the full-res frame).
        w, h = scaler.update(bool(pressed), now)
        renderer.resize(w, h)
        img = scaler.upscale(renderer.render(controller.camera.position))
        im.set_data(img)
        ax.set_title(f"{renderer.accum_sample_count} spp | "
                     f"{renderer.mrays_per_second:.0f} Mrays/s | "
                     f"neural={renderer.use_neural_query}{loss}")
        fig.canvas.draw_idle()
        fig.canvas.flush_events()
    if trainer is not None and args.train_ckpt_dir:
        print(f"checkpoint: {trainer.save(args.train_ckpt_dir)}")
    return 0


def main(argv=None) -> int:
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()
    parser = argparse.ArgumentParser(description="Interactive neural renderer viewer")
    parser.add_argument("config", nargs="?", default="configs/statuette_obj.json")
    parser.add_argument("--headless", type=int, default=0, metavar="N",
                        help="render N accumulation batches without a window")
    parser.add_argument("--output", default="viewer_output")
    parser.add_argument("--save-sequence", action="store_true")
    parser.add_argument("--width", type=int, default=0)
    parser.add_argument("--height", type=int, default=0)
    parser.add_argument("--spp", type=int, default=1)
    parser.add_argument("--motion-drop", type=int, default=4,
                        help="interactive: divide resolution by this while "
                             "the camera moves (1 disables)")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel devices for pixel-stripe "
                             "rendering (height divisible by N)")
    parser.add_argument("--train-steps", type=int, default=0, metavar="N",
                        help="train-while-render: N optimizer steps per frame")
    parser.add_argument("--train-batch", type=int, default=16384)
    parser.add_argument("--train-lr", type=float, default=1e-3)
    parser.add_argument("--train-ckpt-dir", default="",
                        help="save an orbax train-state checkpoint on exit")
    parser.add_argument("--train-resume", default="",
                        help="orbax train-state checkpoint to resume")
    parser.add_argument("--ckpt", default="",
                        help="weights to load (flat FP16 blob or orbax dir), "
                             "overriding the config's checkpoint_path")
    parser.add_argument("--bench-motion", type=float, default=0.0,
                        metavar="SECONDS",
                        help="measure interactivity: orbit the camera for "
                             "SECONDS at the motion-drop preview resolution "
                             "and report fps, then time full-res "
                             "convergence at rest (no display needed)")
    parser.add_argument("--chunk-batches", type=int, default=64,
                        help="bench-motion rest phase: batches chained "
                             "in-jit per dispatch")
    args = parser.parse_args(argv)

    if args.bench_motion > 0:
        return run_motion_bench(args)
    if args.headless > 0:
        return run_headless(args)
    return run_interactive(args)


if __name__ == "__main__":
    sys.exit(main())

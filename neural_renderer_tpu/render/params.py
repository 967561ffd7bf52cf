"""RenderParams: the per-launch parameter block, split static/dynamic for jit.

The reference passes one POD by value to every kernel
(/root/reference/src/render_params.h:8-30). Here the fields that change shapes
or control flow (resolution, spp, bounce count) are static jit constants —
changing them recompiles, which mirrors the reference's accumulation reset on
setting changes (cuda_renderer_neural.cu:2212-2217) — while camera, material
and accumulation state are traced arrays so interactive motion never
recompiles.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.materials import Material


@jax.tree_util.register_dataclass
@dataclass
class RenderParams:
    # --- dynamic (traced) ---
    cam_pos: jnp.ndarray        # [3]
    cam_forward: jnp.ndarray    # [3]
    cam_right: jnp.ndarray      # [3]
    cam_up: jnp.ndarray         # [3]
    fov_y: jnp.ndarray          # scalar
    material_row: jnp.ndarray   # [NUM_SCALARS] — global material constants
    use_constant_neural_color: jnp.ndarray  # scalar bool
    constant_neural_color: jnp.ndarray      # [3]
    use_direct_env_color: jnp.ndarray       # scalar bool
    direct_env_color: jnp.ndarray           # [3]
    max_radiance: jnp.ndarray   # scalar (100.0, cuda_renderer_neural.cu:2246)
    scene_scale: jnp.ndarray    # scalar — classic-mesh bbox diagonal
    sample_offset: jnp.ndarray  # scalar uint32 — accumulated sample count
    outer_shell_min: jnp.ndarray        # [3]
    outer_shell_inv_extent: jnp.ndarray  # [3]
    # --- static (compile-time) ---
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    height: int = dataclasses.field(metadata=dict(static=True), default=0)
    samples_per_pixel: int = dataclasses.field(metadata=dict(static=True), default=1)
    max_bounces: int = dataclasses.field(metadata=dict(static=True), default=3)

    @property
    def pixel_count(self) -> int:
        return self.width * self.height

    @staticmethod
    def make(width: int, height: int, samples_per_pixel: int, max_bounces: int,
             cam_pos, cam_forward, cam_right, cam_up, fov_y: float,
             material: Material, sample_offset: int = 0,
             use_constant_neural_color: bool = False,
             constant_neural_color=(0.8, 0.8, 0.8),
             use_direct_env_color: bool = False,
             direct_env_color=(0.0, 0.0, 0.0),
             scene_scale: float = 1.0,
             outer_shell_min=(0.0, 0.0, 0.0),
             outer_shell_inv_extent=(0.0, 0.0, 0.0)) -> "RenderParams":
        f32 = jnp.float32
        return RenderParams(
            cam_pos=jnp.asarray(cam_pos, f32),
            cam_forward=jnp.asarray(cam_forward, f32),
            cam_right=jnp.asarray(cam_right, f32),
            cam_up=jnp.asarray(cam_up, f32),
            fov_y=jnp.asarray(fov_y, f32),
            material_row=jnp.asarray(np.asarray(material.scalar_row()), f32),
            use_constant_neural_color=jnp.asarray(use_constant_neural_color),
            constant_neural_color=jnp.asarray(constant_neural_color, f32),
            use_direct_env_color=jnp.asarray(use_direct_env_color),
            direct_env_color=jnp.asarray(direct_env_color, f32),
            max_radiance=jnp.asarray(100.0, f32),
            scene_scale=jnp.asarray(scene_scale, f32),
            sample_offset=jnp.asarray(sample_offset, jnp.uint32),
            outer_shell_min=jnp.asarray(outer_shell_min, f32),
            outer_shell_inv_extent=jnp.asarray(outer_shell_inv_extent, f32),
            width=width,
            height=height,
            samples_per_pixel=samples_per_pixel,
            max_bounces=max_bounces,
        )

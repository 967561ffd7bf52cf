"""Primary ray generation with pixel jitter.

(ref: /root/reference/src/mesh_traversal.cuh:40-55). Vectorized over a flat
pixel index array; consumes two rand01 draws per ray in the same order as the
CUDA kernel so sample positions are bit-comparable. Rays are channel-major
[3, N] (ops/linalg.py layout note).
"""

from __future__ import annotations

import jax.numpy as jnp

from .rng import rand01


def generate_primary_rays(px, py, rng_state, cam_pos, cam_forward, cam_right,
                          cam_up, fov_y, width: int, height: int):
    """px, py: [N] int pixel coords. Returns (rng_state, origins, dirs)
    with origins/dirs [3, N]."""
    rng_state, jitter_x = rand01(rng_state)
    rng_state, jitter_y = rand01(rng_state)
    aspect = jnp.float32(width / height)
    u = (px.astype(jnp.float32) + jitter_x) / jnp.float32(width)
    v = 1.0 - (py.astype(jnp.float32) + jitter_y) / jnp.float32(height)
    u = u * 2.0 - 1.0
    v = v * 2.0 - 1.0

    tan_half = jnp.tan(fov_y * 0.5)
    d = (cam_forward[:, None]
         + cam_right[:, None] * (u * aspect * tan_half)[None, :]
         + cam_up[:, None] * (v * tan_half)[None, :])
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    origins = jnp.broadcast_to(cam_pos[:, None], d.shape)
    return rng_state, origins, d

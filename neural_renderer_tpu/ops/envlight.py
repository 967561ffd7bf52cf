"""Environment lighting: equirect sampling with rotation, bilinear filtering,
firefly clamping, and the procedural sky fallback.

(ref: sampleEnvironment + sampleEnvironmentWithClamp,
/root/reference/src/cuda_renderer_neural.cu:115-202). Mapping matches NBVH:
u = atan2(x, -z)/(2*pi) + 0.5, v = acos(y)/pi, bilinear with -0.5 texel offset
and edge clamping, radiance hard-clamped at 100 before the per-call
maxRadiance clamp. Directions/colors are channel-major [3, N]; texels gather
from the [3, H*W] flat map.
"""

from __future__ import annotations

import jax.numpy as jnp

from .linalg import lerp, splat

_INV_PI = 0.3183098861837907
_ENV_HARD_CLAMP = 100.0


def sample_environment(env, dirs):
    """env: EnvmapArrays; dirs: [3, N] unit vectors. Returns [3, N]."""
    n = dirs.shape[1]
    if not env.is_valid:
        # NBVH sky-like background (cuda_renderer_neural.cu:166-171).
        sky_t = 0.5 * (dirs[1] + 1.0)
        return lerp(splat([1.0, 1.0, 1.0], n),
                    splat([0.5, 0.7, 1.0], n), sky_t[None, :])

    h, w = env.height, env.width

    # Rotation around Y (degrees).
    angle = env.rotation * jnp.float32(jnp.pi / 180.0)
    cos_a = jnp.cos(angle)
    sin_a = jnp.sin(angle)
    dx = dirs[0] * cos_a + dirs[2] * sin_a
    dz = -dirs[0] * sin_a + dirs[2] * cos_a
    dy = dirs[1]

    u = jnp.arctan2(dx, -dz) * (_INV_PI * 0.5) + 0.5
    v = jnp.arccos(jnp.clip(dy, -1.0, 1.0)) * _INV_PI
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)

    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0c = jnp.clip(x0, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    tx = (x - x0.astype(jnp.float32))[None, :]
    ty = (y - y0.astype(jnp.float32))[None, :]

    def fetch(xi, yi):
        return jnp.take(env.pixels, yi * w + xi, axis=1)  # [3, N]

    c00 = fetch(x0c, y0c)
    c10 = fetch(x1, y0c)
    c01 = fetch(x0c, y1)
    c11 = fetch(x1, y1)
    c0 = c00 * (1.0 - tx) + c10 * tx
    c1 = c01 * (1.0 - tx) + c11 * tx
    color = (c0 * (1.0 - ty) + c1 * ty) * env.strength
    return jnp.minimum(color, _ENV_HARD_CLAMP)


def sample_environment_clamped(env, dirs, max_radiance):
    """sampleEnvironmentWithClamp (cuda_renderer_neural.cu:193-202)."""
    return jnp.minimum(sample_environment(env, dirs), max_radiance)

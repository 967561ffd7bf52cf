"""Vector helpers over CHANNEL-MAJOR [3, N] arrays (ref: src/vec3.h:14-106).

TPU layout note (the reason for the convention): XLA tiles the two minor
dimensions of an array to (8 sublanes, 128 lanes). A row-major [N, 3] array
puts the 3-wide channel axis on the lanes and is padded 3 -> 128 — a 42x
memory/bandwidth amplification on every materialized buffer and gather
result. Channel-major [3, N] puts the big ray axis on the lanes, so buffers
are dense. All hot-path code (traversal, shading, path state) therefore
carries vectors as [3, N]; images are converted to [H, W, 3] only at the
host boundary.
"""

from __future__ import annotations

import jax.numpy as jnp


def vec3(x, y, z):
    """Stack three [N] components into [3, N]."""
    return jnp.stack([x, y, z], axis=0)


def splat(v, n: int, dtype=jnp.float32):
    """Broadcast a length-3 constant to [3, N]."""
    v = jnp.asarray(v, dtype)
    return jnp.broadcast_to(v[:, None], (3, n))


def dot(a, b):
    return jnp.sum(a * b, axis=0)


def cross(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ], axis=0)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v, eps: float = 0.0):
    n = length(v)
    if eps > 0.0:
        n = jnp.maximum(n, eps)
    return v / n[None, :]


def safe_normalize(v, fallback=(0.0, 1.0, 0.0), eps: float = 1e-20,
                   min_len: float = 0.0):
    """normalize(v) where |v| > min_len else the fallback constant."""
    n = length(v)
    fb = jnp.broadcast_to(jnp.asarray(fallback, v.dtype)[:, None], v.shape)
    out = v / jnp.maximum(n, eps)[None, :]
    return jnp.where((n > min_len)[None, :], out, fb)


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def luminance(c):
    """Rec.709 luminance of a [3, N] color (disney_brdf.cuh:23-25)."""
    return 0.2126 * c[0] + 0.7152 * c[1] + 0.0722 * c[2]


def reflect(wi, n):
    """wi - n * 2 (wi . n)  (disney_brdf.cuh:289-291)."""
    return wi - n * (2.0 * dot(wi, n))[None, :]


def where3(mask, a, b):
    """Select [3, N] by an [N] mask."""
    return jnp.where(mask[None, :], a, b)


def to_rows(v):
    """[3, N] -> [N, 3] (host/boundary use only)."""
    return jnp.transpose(v)


def from_rows(v):
    """[N, 3] -> [3, N] (host/boundary use only)."""
    return jnp.transpose(v)

"""Small vector helpers over [..., 3] arrays (ref: src/vec3.h:14-106)."""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v, eps: float = 0.0):
    n = length(v)
    if eps > 0.0:
        n = jnp.maximum(n, eps)
    return v / n[..., None]


def safe_normalize(v, fallback=(0.0, 1.0, 0.0), eps: float = 1e-20, min_len: float = 0.0):
    """normalize(v) where |v| > min_len else fallback."""
    n = length(v)
    fb = jnp.broadcast_to(jnp.asarray(fallback, v.dtype), v.shape)
    out = v / jnp.maximum(n, eps)[..., None]
    return jnp.where((n > min_len)[..., None], out, fb)


def lerp(a, b, t):
    return a * (1.0 - t) + b * t


def luminance(c):
    """Rec.709 luminance (disney_brdf.cuh:23-25)."""
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def reflect(wi, n):
    """wi - n * 2 (wi . n)  (disney_brdf.cuh:289-291)."""
    return wi - n * (2.0 * dot(wi, n))[..., None]

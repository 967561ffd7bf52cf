"""sRGB transfer functions (ref: denoiser.cuh:12-25, mesh_intersection.cuh:154-162)."""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_srgb(v):
    v = jnp.maximum(v, 0.0)
    low = 12.92 * v
    high = 1.055 * jnp.power(jnp.maximum(v, 1e-12), 1.0 / 2.4) - 0.055
    return jnp.minimum(jnp.where(v <= 0.0031308, low, high), 1.0)


def srgb_to_linear(v):
    low = v / 12.92
    high = jnp.power((jnp.maximum(v, 0.0) + 0.055) / 1.055, 2.4)
    return jnp.where(v <= 0.04045, low, high)


def encode_srgb_u8(color):
    """Linear RGB [..., 3] -> uint8 like the CUDA finalize kernels
    (truncating cast, cuda_renderer_neural.cu:704-708)."""
    c = linear_to_srgb(color)
    return (c * 255.0).astype(jnp.uint8)

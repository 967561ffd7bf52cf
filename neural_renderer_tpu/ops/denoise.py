"""Joint bilateral denoiser — implemented AND wired in.

The reference ships this kernel fully written but never launches it
(denoiser.cuh:46-113 is dormant; SURVEY.md caveats). Same parameters here:
11x11 window (radius 5), spatial sigma 3, normal-similarity dot^64, albedo
Gaussian sigma 0.1. Input is the running linear-HDR accumulation buffer plus
sample-0 primary-hit guide normals/albedo; output is the denoised sRGB u8
image.

XLA-native formulation: the 121 taps are a static python loop of shifted
whole-image multiply-adds over padded arrays — fused into one elementwise
kernel, no gather/scatter. All buffers are channel-major [3, H, W] (the W
axis rides the 128 lanes; ops/linalg.py layout note); the u8 [H, W, 3] image
is produced only at the output boundary.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .srgb import encode_srgb_u8

DENOISE_RADIUS = 5
SIGMA_SPATIAL = 3.0
NORMAL_ALPHA = 64.0
SIGMA_ALBEDO = 0.1


def _bilateral_core(color_p, normals_p, albedo_p, valid_p, h: int, w: int):
    """Stencil core on PRE-PADDED arrays: *_p are [3, h+2r, w+2r] (valid_p
    [h+2r, w+2r]); rows/cols outside the true image carry valid=0 and get
    zero tap weight (the reference's window clipping, denoiser.cuh:55-63).
    Returns the denoised linear-HDR center [3, h, w].

    The padded rows need not be zero: the tiled path fills them with real
    neighbor-stripe rows (valid=1), which is exactly how the stencil sees
    interior rows on a single device — so stripe and whole-frame runs are
    the same math per pixel."""
    r = DENOISE_RADIUS
    inv_ss2 = 1.0 / (2.0 * SIGMA_SPATIAL * SIGMA_SPATIAL)
    inv_sa2 = 1.0 / (2.0 * SIGMA_ALBEDO * SIGMA_ALBEDO)

    center = (slice(None), slice(r, r + h), slice(r, r + w))
    color = color_p[center]
    guide_normals = normals_p[center]
    guide_albedo = albedo_p[center]

    weighted = jnp.zeros_like(color)
    total_w = jnp.zeros(color.shape[1:], color.dtype)

    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            sl = (slice(None), slice(r + dy, r + dy + h),
                  slice(r + dx, r + dx + w))
            n_color = color_p[sl]
            n_norm = normals_p[sl]
            n_alb = albedo_p[sl]
            n_valid = valid_p[sl[1:]]

            w_spatial = math.exp(-(dx * dx + dy * dy) * inv_ss2)
            ndot = jnp.clip(jnp.sum(guide_normals * n_norm, axis=0), 0.0, 1.0)
            w_normal = jnp.power(ndot, NORMAL_ALPHA)
            da = n_alb - guide_albedo
            w_albedo = jnp.exp(-jnp.sum(da * da, axis=0) * inv_sa2)

            wgt = w_spatial * w_normal * w_albedo * n_valid
            weighted = weighted + n_color * wgt[None, :, :]
            total_w = total_w + wgt

    return jnp.where(total_w[None] > 0.0,
                     weighted / jnp.maximum(total_w, 1e-20)[None], color)


def bilateral_denoise(accum, accum_count, guide_normals, guide_albedo):
    """accum: [3, H, W] linear HDR sums; accum_count: scalar; guides
    [3, H, W]. Returns denoised u8 image [H, W, 3]."""
    inv_accum = 1.0 / jnp.maximum(1.0, accum_count)
    color = accum * inv_accum

    r = DENOISE_RADIUS
    h, w = color.shape[1:]
    pad = ((0, 0), (r, r), (r, r))
    out = _bilateral_core(
        jnp.pad(color, pad), jnp.pad(guide_normals, pad),
        jnp.pad(guide_albedo, pad),
        jnp.pad(jnp.ones(color.shape[1:], color.dtype), ((r, r), (r, r))),
        h, w)
    return encode_srgb_u8(out).transpose(1, 2, 0)

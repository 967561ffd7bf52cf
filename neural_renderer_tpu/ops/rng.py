"""Counter-based wang-hash RNG, bit-exact with the reference.

(ref: /root/reference/src/mesh_traversal.cuh:17-34). The renderer is
deterministic per (pixel, sampleOffset, sample) which golden-image tests rely
on (SURVEY.md §4.5); all arithmetic is wrapping uint32.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def wang_hash(x):
    x = x.astype(_U32)
    x = (x ^ _U32(61)) ^ (x >> _U32(16))
    x = x * _U32(9)
    x = x ^ (x >> _U32(4))
    x = x * _U32(0x27D4EB2D)
    x = x ^ (x >> _U32(15))
    return x


def init_rng(pixel_idx, sample_offset, sample_idx):
    """seed = pixel*9781 + (sampleOffset + sample + 1)*6271, wang-hashed."""
    pixel_idx = jnp.asarray(pixel_idx).astype(_U32)
    sample_offset = jnp.asarray(sample_offset).astype(_U32)
    sample_idx = jnp.asarray(sample_idx).astype(_U32)
    seed = pixel_idx * _U32(9781) + (sample_offset + sample_idx + _U32(1)) * _U32(6271)
    return wang_hash(seed)


def rand01(state):
    """Advance state; return (new_state, uniform in [0, 1))."""
    state = wang_hash(state)
    val = (state & _U32(0x00FFFFFF)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)
    return state, val

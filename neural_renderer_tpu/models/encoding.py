"""Input encodings: multiresolution hash grid + spherical harmonics.

Pure-JAX reimplementation of the tiny-cuda-nn encodings the reference builds
(/root/reference/src/cuda_renderer_neural.cu:1647-1675): per 3D point a
HashGrid (n_levels=8, 4 features/level, per_level_scale=2.0, base_resolution
and log2_hashmap_size from config) and SphericalHarmonics degree 4 for the
direction. Semantics follow tcnn's grid.h:

  * level scale  s_l = 2^(l*log2(per_level_scale)) * base_resolution - 1
  * resolution   R_l = ceil(s_l) + 1
  * sample pos   p = x*s_l + 0.5; corner = floor(p); w = p - corner
  * indexing     dense (stride accumulation) while R^3 <= hashmap entries,
                 else coherent prime hash {1, 2654435761, 805459861}
  * per-level table size min(R^3, 2^log2_hashmap_size), rounded up to 8
  * trilinear interpolation of 8 corners, features interleaved per entry
  * output layout level-major: [L0f0..L0f3, L1f0.., ...]

TPU layout: inputs are channel-major [3, N]; feature gathers pull per-feature
[N] columns (a [N, 4]-row gather would lane-pad 32x — ops/linalg.py). The
table parameter layout stays [entries, features] for checkpoint parity; the
transpose happens once per call inside the encode.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 8
    n_features: int = 4
    log2_hashmap_size: int = 14
    base_resolution: int = 16
    per_level_scale: float = 2.0

    def level_scale(self, level: int) -> float:
        return (2.0 ** (level * math.log2(self.per_level_scale))
                * self.base_resolution - 1.0)

    def level_resolution(self, level: int) -> int:
        return int(math.ceil(self.level_scale(level))) + 1

    def level_entries(self, level: int) -> int:
        """Table entries for one level (dense volume or hashmap), padded to 8."""
        res = self.level_resolution(level)
        hashmap = 1 << self.log2_hashmap_size
        dense = res ** 3
        n = dense if dense <= hashmap else hashmap
        return ((n + 7) // 8) * 8

    def level_is_dense(self, level: int) -> bool:
        res = self.level_resolution(level)
        # tcnn hashes when the dense stride overflows the hashmap size.
        return res ** 3 <= (1 << self.log2_hashmap_size)

    @property
    def n_params(self) -> int:
        return sum(self.level_entries(l) for l in range(self.n_levels)) * self.n_features

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features


def init_hashgrid(key, config: HashGridConfig, dtype=jnp.float32):
    """tcnn default init: uniform(-1e-4, 1e-4). Returns list of [E_l, F]."""
    tables = []
    for level in range(config.n_levels):
        key, sub = jax.random.split(key)
        tables.append(jax.random.uniform(
            sub, (config.level_entries(level), config.n_features),
            minval=-1e-4, maxval=1e-4, dtype=dtype))
    return tables


def _corner_index(cfg: HashGridConfig, level: int, ix, iy, iz):
    """Grid entry index for integer corner coords (tcnn grid_index)."""
    res = cfg.level_resolution(level)
    entries = cfg.level_entries(level)
    ux = ix.astype(jnp.uint32)
    uy = iy.astype(jnp.uint32)
    uz = iz.astype(jnp.uint32)
    if cfg.level_is_dense(level):
        idx = ux + uy * jnp.uint32(res) + uz * jnp.uint32(res * res)
    else:
        idx = (ux * jnp.uint32(_PRIMES[0])
               ^ uy * jnp.uint32(_PRIMES[1])
               ^ uz * jnp.uint32(_PRIMES[2]))
    return (idx % jnp.uint32(entries)).astype(jnp.int32)


def hashgrid_encode_features(tables, x, config: HashGridConfig):
    """x: [3, N] in [0, 1]. Returns list of L*F feature arrays [N]
    (level-major, feature order within level)."""
    outs = []
    for level in range(config.n_levels):
        scale = jnp.float32(config.level_scale(level))
        p = x * scale + 0.5
        corner = jnp.floor(p)
        w = p - corner
        c0 = corner.astype(jnp.int32)

        table_t = tables[level].T  # [F, E] — feature-major for dense gathers
        acc = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    idx = _corner_index(config, level,
                                        c0[0] + dx, c0[1] + dy, c0[2] + dz)
                    wx = w[0] if dx else (1.0 - w[0])
                    wy = w[1] if dy else (1.0 - w[1])
                    wz = w[2] if dz else (1.0 - w[2])
                    wc = wx * wy * wz
                    # ONE packed gather per corner ([F, N]); XLA TPU gathers
                    # pay per-index, so per-feature takes would cost 4x.
                    acc = acc + jnp.take(table_t, idx, axis=1) * wc[None, :]
        outs.extend(acc[f] for f in range(config.n_features))
    return outs


def hashgrid_encode(tables, x, config: HashGridConfig):
    """x: [3, N] in [0, 1]. Returns [N, L*F] level-major features."""
    return jnp.stack(hashgrid_encode_features(tables, x, config), axis=-1)


# ---------------------------------------------------------------------------
# Spherical harmonics (tcnn sh_enc, degree 4 -> 16 coefficients)
# ---------------------------------------------------------------------------

SH_DEGREE = 4
SH_DIM = SH_DEGREE * SH_DEGREE


def sh_encode_features(d01):
    """d01: [3, N] direction mapped to [0,1] (the pipeline stores (d+1)/2,
    buildSegmentNeuralInputsKernel cuda_renderer_neural.cu:996-1000); tcnn
    maps back to [-1,1] and evaluates WITHOUT normalizing. Returns a list of
    16 arrays [N]."""
    d = d01 * 2.0 - 1.0
    x, y, z = d[0], d[1], d[2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z

    return [
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * z2 - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        0.59004358992664352 * y * (-3.0 * x2 + y2),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z2),
        0.3731763325901154 * z * (5.0 * z2 - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z2),
        1.4453057213202769 * z * (x2 - y2),
        0.59004358992664352 * x * (-x2 + 3.0 * y2),
    ]


def sh_encode(d01):
    """d01: [3, N] -> [N, 16]."""
    return jnp.stack(sh_encode_features(d01), axis=-1)

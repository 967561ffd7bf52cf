"""Fused shell-network forward: Pallas MLP kernel with VMEM-resident weights.

This is the TPU replacement for tiny-cuda-nn's FullyFusedMLP
(cuda_renderer_neural.cu:1677-1686). Design notes (and why it is NOT a
line-for-line tcnn translation):

  * The multiresolution hash-grid gathers stay in XLA: Mosaic/Pallas on TPU
    has no arbitrary vector gather from VMEM (only same-shape lane-wise
    gathers), while XLA's native `gather` lowering IS the efficient path for
    [N]-indexed table lookups. Fighting that would be slower, not faster.
  * Everything dense is fused in one Pallas kernel: the five bias-free
    matmuls run back-to-back on the MXU with LeakyReLU on the VPU, weights
    pinned in VMEM across all grid steps (index_map -> block 0), and the
    [N, 128] activations never round-trip to HBM between layers — the part
    of tcnn's "fully fused" trick that actually matters on this hardware.
  * bf16 operands, f32 accumulation (preferred_element_type), f32 output.

`apply_fused(params, inputs, config)` is a drop-in replacement for
models.nbvh.apply (bf16 mode) and is parity-tested against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import nbvh

BLOCK_N = 512
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mlp_kernel(x_ref, w0_ref, w1_ref, w2_ref, w3_ref, wout_ref, out_ref):
    """One [BLOCK_N, 128] block through 4 hidden layers + linear output.
    Weights are [in(128), out(128)] blocks living in VMEM for the whole grid."""
    # Pin DEFAULT precision: a global jax_default_matmul_precision='highest'
    # would request an fp32-contract bf16 matmul Mosaic cannot lower.
    prec = jax.lax.Precision.DEFAULT
    h = x_ref[:]
    for w_ref in (w0_ref, w1_ref, w2_ref, w3_ref):
        a = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
        a = jnp.where(a > 0, a, nbvh.LEAKY_SLOPE * a)
        h = a.astype(h.dtype)
    out_ref[:] = jnp.dot(h, wout_ref[:], preferred_element_type=jnp.float32,
                         precision=prec)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_mlp(x_padded, w0, w1, w2, w3, wout, interpret=False):
    """x_padded: [Npad, 128] bf16; weights [128, 128] bf16 ([in, out],
    zero-padded). Returns [Npad, 128] f32 (first 16 cols meaningful)."""
    n = x_padded.shape[0]
    grid = (n // BLOCK_N,)

    def x_map(i):
        return (i, 0)

    def w_map(i):
        return (0, 0)

    return pl.pallas_call(
        _mlp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, LANE), x_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, LANE), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, LANE), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, LANE), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, LANE), w_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE, LANE), w_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, LANE), x_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANE), jnp.float32),
        interpret=interpret,
    )(x_padded, w0, w1, w2, w3, wout)


def pack_weights(params, config: nbvh.NbvhConfig, dtype=jnp.bfloat16):
    """MLP matrices [out, in] -> transposed, zero-padded [128, 128] blocks."""
    assert config.mlp_width == LANE and config.mlp_hidden_layers == 4, (
        "fused kernel is specialized for the reference architecture "
        "(128 wide, 4 hidden layers)")
    mats = []
    for w in params["mlp"]:
        wt = w.T.astype(dtype)  # [in, out]
        pad_in = _round_up(wt.shape[0], LANE) - wt.shape[0]
        pad_out = _round_up(wt.shape[1], LANE) - wt.shape[1]
        mats.append(jnp.pad(wt, ((0, pad_in), (0, pad_out))))
    return mats


def apply_fused(params, inputs, config: nbvh.NbvhConfig,
                interpret: bool = False):
    """Drop-in for nbvh.apply(..., compute_dtype=bf16): XLA hash-grid
    gathers + SH, then the fused Pallas MLP. inputs [12, N] channel-major;
    returns [padded_out, N] f32."""
    n = inputs.shape[1]
    enc = nbvh.encode_inputs(params, inputs, config).astype(jnp.bfloat16)

    npad = _round_up(max(n, BLOCK_N), BLOCK_N)
    cpad = _round_up(enc.shape[1], LANE)
    enc = jnp.pad(enc, ((0, npad - n), (0, cpad - enc.shape[1])))

    w0, w1, w2, w3, wout = pack_weights(params, config)
    out = _fused_mlp(enc, w0, w1, w2, w3, wout, interpret=interpret)
    return out[:n, :config.padded_output_dims].T

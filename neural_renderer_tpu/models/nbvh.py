"""The neural intersection network ("NBVH shell network").

Architecture parity with the reference's tcnn NetworkWithInputEncoding
(/root/reference/src/cuda_renderer_neural.cu:1632-1718):
  input [entry.xyz | exit.xyz | mid.xyz | dir.xyz]  (12 dims)
  Composite encoding = 3x HashGrid(8 levels, 4 feat, 2.0x/level) + SH degree 4
    -> 3*32 + 16 = 112 features
  FullyFusedMLP: 128 wide, 4 hidden layers, LeakyReLU, no biases,
    5 requested outputs padded to 16.
Outputs (applySegmentNeuralOutputKernel, :1037-1044): [0]=presence logit,
[1]=distance from (shifted) segment entry, [2:5]=normal, [5:8]=color (only
meaningful for 8-output checkpoints — the stock network carries padding
there, SURVEY.md §2.2 note).

Weight-blob IO matches loadWeightsFromFile (:1752-1808): flat FP16 file of
[mlp | hg] (or [hg | mlp] when swap_param_order), a SINGLE hash grid tiled
into all three encoder slots.

Forward math runs in bf16 on the MXU with f32 accumulation by default
(use param_dtype/compute_dtype to get an f32 reference mode).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import SH_DIM, HashGridConfig, hashgrid_encode, init_hashgrid, sh_encode

LEAKY_SLOPE = 0.01  # tcnn LeakyReLU negative slope

# Segment-count cap per XLA encode+MLP dispatch; larger batches are chunked
# with lax.map (see apply) to bound HBM temps (~1 KB/segment of activations).
ENC_CHUNK = 1 << 21


@dataclass(frozen=True)
class NbvhConfig:
    log2_hashmap_size: int = 14
    base_resolution: int = 16
    n_levels: int = 8
    n_features: int = 4
    per_level_scale: float = 2.0
    point_count: int = 3            # entry, exit, midpoint
    mlp_width: int = 128
    mlp_hidden_layers: int = 4
    output_dims: int = 5
    padded_output_dims: int = 16
    # "tcnn": reference-compatible hash grid (checkpoint parity, XLA gathers).
    # "lane": TPU-native lane-local grid (models/lane_grid.py) — per
    # (point, level, feature) tables of lane_sublanes*lane_entry_pack*128
    # entries, served by the fully fused Pallas kernel
    # (ops/lane_grid_kernel.py) at inference. lane_entry_pack=2 stores two
    # bf16-rounded entries per f32 lane (2x capacity, same gather count);
    # 1 keeps one full-f32 entry per lane (legacy checkpoints).
    grid_type: str = "tcnn"
    lane_sublanes: int = 8
    lane_entry_pack: int = 2

    @property
    def input_dims(self) -> int:
        return self.point_count * 3 + 3

    @property
    def grid(self) -> HashGridConfig:
        return HashGridConfig(
            n_levels=self.n_levels, n_features=self.n_features,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            per_level_scale=self.per_level_scale)

    @property
    def encoded_dims(self) -> int:
        return self.point_count * self.grid.output_dim + SH_DIM

    @property
    def mlp_n_params(self) -> int:
        w, e = self.mlp_width, self.encoded_dims
        return (w * e + (self.mlp_hidden_layers - 1) * w * w
                + self.padded_output_dims * w)

    @property
    def hg_n_params(self) -> int:
        return self.grid.n_params

    @property
    def n_params(self) -> int:
        return self.mlp_n_params + self.point_count * self.hg_n_params

    @property
    def lane_entries(self) -> int:
        """Entries per (point, level, feature) table in lane-grid mode."""
        return self.lane_sublanes * self.lane_entry_pack * 128


def init_params(key, config: NbvhConfig, dtype=jnp.float32,
                shared_grid: bool = True):
    """Random init: hash tables uniform(-1e-4,1e-4) (tcnn default), MLP He.

    shared_grid=True (default) uses ONE hash grid for all encoder slots —
    the structure the reference's flat checkpoint implies (a single grid
    block tiled into all three slots, cuda_renderer_neural.cu:1764-1804), so
    trained weights survive the blob export/load round trip. Independent
    grids (shared_grid=False) give more capacity but only slot 0 exports.
    """
    keys = jax.random.split(key, config.point_count + config.mlp_hidden_layers + 1)
    if config.grid_type == "lane":
        from .lane_grid import init_lane_tables
        lane = init_lane_tables(keys[0], config.point_count, config.n_levels,
                                config.n_features, config.lane_sublanes,
                                config.lane_entry_pack, dtype)
        grids = None
    else:
        n_grids = 1 if shared_grid else config.point_count
        grids = [init_hashgrid(keys[i], config.grid, dtype)
                 for i in range(n_grids)]

    mlp = []
    dims = ([config.encoded_dims]
            + [config.mlp_width] * config.mlp_hidden_layers
            + [config.padded_output_dims])
    for i in range(len(dims) - 1):
        fan_in = dims[i]
        std = math.sqrt(2.0 / fan_in)
        w = jax.random.normal(keys[config.point_count + i],
                              (dims[i + 1], dims[i]), dtype) * std
        mlp.append(w)
    if config.grid_type == "lane":
        return {"lane": lane, "mlp": mlp}
    return {"grids": grids, "mlp": mlp}


def encode_inputs(params, inputs, config: NbvhConfig):
    """inputs [12, N] channel-major -> encoded [N, encoded_dims] (f32).

    Features are collected as [N] columns and stacked ONCE, so nothing
    materializes a lane-padded narrow array (ops/linalg.py layout note)."""
    from .encoding import hashgrid_encode_features, sh_encode_features
    feats = []
    if config.grid_type == "lane":
        from .lane_grid import lane_encode_features
        feats.extend(lane_encode_features(
            params["lane"], inputs, config.base_resolution,
            config.per_level_scale))
    else:
        n_grids = len(params["grids"])
        for p in range(config.point_count):
            x = inputs[p * 3:(p + 1) * 3]
            grid = params["grids"][p % n_grids]  # shared when n_grids == 1
            feats.extend(hashgrid_encode_features(grid, x, config.grid))
    feats.extend(sh_encode_features(inputs[config.point_count * 3:
                                           config.point_count * 3 + 3]))
    return jnp.stack(feats, axis=-1)


def mlp_forward(mlp_params, x, compute_dtype=jnp.bfloat16):
    """Bias-free LeakyReLU MLP; matmuls on the MXU in compute_dtype with f32
    accumulation; output layer linear. compute_dtype=float32 selects the
    accurate reference mode (full-precision MXU passes) for debugging.
    x: [N, encoded]; returns CHANNEL-MAJOR [padded_out, N] f32."""
    precision = "highest" if compute_dtype == jnp.float32 else None
    h = x.astype(compute_dtype)
    n_layers = len(mlp_params)
    for i, w in enumerate(mlp_params):
        h = jnp.dot(h, w.astype(compute_dtype).T,
                    preferred_element_type=jnp.float32, precision=precision)
        if i < n_layers - 1:
            h = jnp.where(h > 0, h, LEAKY_SLOPE * h)
        h = h.astype(compute_dtype) if i < n_layers - 1 else h
    return h.astype(jnp.float32).T


def apply(params, inputs, config: NbvhConfig, compute_dtype=jnp.bfloat16,
          use_kernel: bool = False, active=None):
    """Full forward: [12, N] -> [padded_output_dims, N] f32 (channel-major:
    row 0 = presence logit, 1 = distance, 2:5 = normal, 5:8 = color).

    use_kernel=True routes TPU lowerings of lane-grid networks through the
    fully fused Pallas kernel (inference only — not differentiable; training
    keeps use_kernel=False and differentiates this XLA path, mirroring the
    reference where tcnn inference_mixed_precision is likewise
    inference-only). Non-TPU platforms fall back to the XLA path.

    `active` ([N] bool) is a kernel-path-only hint: 128-ray blocks with no
    active ray skip the network and output zeros (the caller must mask those
    lanes, as the shell march does). The XLA path ignores it — outputs are
    only compared on active lanes."""
    if (use_kernel and config.grid_type == "lane"
            and compute_dtype == jnp.bfloat16):
        from ..ops.lane_grid_kernel import forward_lane

        def tpu_fn(params, inputs, active):
            from ..ops.traversal import pallas_interpret_requested
            return forward_lane(params, inputs, config,
                                interpret=pallas_interpret_requested(),
                                active=active)

        def default_fn(params, inputs, active):
            encoded = encode_inputs(params, inputs, config)
            return mlp_forward(params["mlp"], encoded,
                               compute_dtype=jnp.bfloat16)

        if active is None:
            active = jnp.ones((inputs.shape[1],), bool)
        return jax.lax.platform_dependent(params, inputs, active,
                                          tpu=tpu_fn, default=default_fn)
    n = inputs.shape[1]
    if n > ENC_CHUNK:
        # Chunk the XLA encode+MLP over segments: the [N, 112] feature stack
        # plus [N, 128] activations materialize ~1 KB/segment of f32 temps,
        # which OOMs HBM above ~2M segments (1080p batches with spp > 1 —
        # evaluate.cu:22-23 uses 8 spp per render call). lax.map bounds the
        # temp footprint to one chunk; weights stay resident across chunks.
        k = -(-n // ENC_CHUNK)
        pad = k * ENC_CHUNK - n
        xp = jnp.pad(inputs, ((0, 0), (0, pad)))
        xp = xp.reshape(inputs.shape[0], k, ENC_CHUNK).swapaxes(0, 1)

        def one(xi):
            encoded = encode_inputs(params, xi, config)
            return mlp_forward(params["mlp"], encoded,
                               compute_dtype=compute_dtype)

        out = jax.lax.map(one, xp)          # [k, padded_out, ENC_CHUNK]
        out = out.swapaxes(0, 1).reshape(out.shape[1], k * ENC_CHUNK)
        return out[:, :n]
    encoded = encode_inputs(params, inputs, config)
    return mlp_forward(params["mlp"], encoded, compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# Flat FP16 blob IO (reference checkpoint format)
# ---------------------------------------------------------------------------

def _split_grid_blob(flat: np.ndarray, config: NbvhConfig):
    """Flat per-grid params -> per-level [E_l, F] arrays (level-major,
    feature-interleaved, tcnn layout)."""
    grid = config.grid
    tables = []
    cursor = 0
    for level in range(grid.n_levels):
        n = grid.level_entries(level)
        chunk = flat[cursor:cursor + n * grid.n_features]
        tables.append(chunk.reshape(n, grid.n_features))
        cursor += n * grid.n_features
    return tables


def _split_mlp_blob(flat: np.ndarray, config: NbvhConfig):
    dims = ([config.encoded_dims]
            + [config.mlp_width] * config.mlp_hidden_layers
            + [config.padded_output_dims])
    mats = []
    cursor = 0
    for i in range(len(dims) - 1):
        rows, cols = dims[i + 1], dims[i]
        mats.append(flat[cursor:cursor + rows * cols].reshape(rows, cols))
        cursor += rows * cols
    return mats


def load_flat_blob(path: str, config: NbvhConfig, swap_param_order: bool = True,
                   dtype=jnp.float32):
    """Load the reference's flat FP16 checkpoint
    (cuda_renderer_neural.cu:1752-1808): [mlp | hg] or, with
    swap_param_order (the default there too), [hg | mlp]; the single hash
    grid block is tiled into all point_count encoder slots."""
    if config.grid_type == "lane":
        raise ValueError(
            "The reference flat-FP16 blob encodes the tcnn grid layout; "
            "lane-grid networks checkpoint via orbax (train/trainer.py).")
    raw = np.fromfile(path, dtype=np.float16)
    expected = config.mlp_n_params + config.hg_n_params
    if raw.size != expected:
        raise ValueError(
            f"Weights size mismatch (got {raw.size} halfs, expected {expected}). "
            f"Format: [mlp | hg] or (with swap_param_order) [hg | mlp] (FP16).")
    raw = raw.astype(np.float32)
    if swap_param_order:
        hg, mlp = raw[:config.hg_n_params], raw[config.hg_n_params:]
    else:
        mlp, hg = raw[:config.mlp_n_params], raw[config.mlp_n_params:]
    tables = _split_grid_blob(hg, config)
    # The single grid block is SHARED across all encoder slots (the
    # reference tiles one copy into each slot; sharing is equivalent and is
    # also how training keeps the export lossless).
    grids = [[jnp.asarray(t, dtype) for t in tables]]
    mlp_mats = [jnp.asarray(m, dtype) for m in _split_mlp_blob(mlp, config)]
    return {"grids": grids, "mlp": mlp_mats}


def save_flat_blob(path: str, params, config: NbvhConfig,
                   swap_param_order: bool = True, grid_slot: int = 0):
    """Export to the reference's flat FP16 format (one hash grid slot)."""
    if "grids" not in params:
        raise ValueError(
            "Only tcnn-layout networks export to the reference blob format; "
            "lane-grid networks checkpoint via orbax (train/trainer.py).")
    hg = np.concatenate([np.asarray(t, np.float32).reshape(-1)
                         for t in params["grids"][grid_slot]])
    mlp = np.concatenate([np.asarray(m, np.float32).reshape(-1)
                          for m in params["mlp"]])
    blob = np.concatenate([hg, mlp] if swap_param_order else [mlp, hg])
    blob.astype(np.float16).tofile(path)

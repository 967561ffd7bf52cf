"""Online training loop: optax Adam + orbax checkpoints + flat-blob export.

The piece the reference only gestures at (its C++ runtime is inference-only;
SURVEY.md caveats): train the shell network against ground-truth mesh queries
generated on the fly, checkpoint with orbax, and export to the reference's
flat FP16 blob for cross-validation with loadWeightsFromFile.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models import nbvh
from .dataset import sample_segment_batch
from .losses import LossWeights, shell_losses


@dataclass
class TrainConfig:
    batch_size: int = 16384
    learning_rate: float = 1e-3
    weight_decay: float = 1e-6
    steps: int = 2000
    compute_dtype: str = "bfloat16"
    seed: int = 0
    log_every: int = 100
    checkpoint_every: int = 1000
    # "constant" or "cosine" (decays to lr_end_factor * learning_rate over
    # `steps`; instant-ngp-style runs converge noticeably better with decay).
    lr_schedule: str = "constant"
    lr_end_factor: float = 0.05
    # March each sampled ray this many segments deep (re-entries) and train
    # on ALL of them — required coverage for non-convex shells (knot scene),
    # where strand-facing segments are never first crossings.
    segments_per_ray: int = 1
    # Fused Pallas forward+backward for lane-grid networks
    # (ops/lane_grid_train_kernel.py): "auto" = on real TPU only, "on" =
    # always (interpret mode off-TPU — slow, for tests), "off" = XLA twin.
    fused_kernel: str = "auto"


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def scene_global_row(scene):
    """The scene's global-material scalar row as a device array — what the
    renderer resolves material_id < 0 hits against (params.material_row), so
    the one the sampler's color supervision must use. A mismatch trains the
    color head to the wrong albedo on untextured meshes (found on the knot
    scene: the default 0.8-grey row coincided with the sphere config's
    base_color, hiding the bug in round 1)."""
    return jnp.asarray(np.asarray(scene.global_material.scalar_row()),
                       jnp.float32)


def segment_domain(scene):
    """The shell network's sampling domain for a scene: (outer_shell_min,
    outer_shell_inv_extent) as f32 device arrays + the segment-sampling
    sphere radius (1.5x the outer-shell diagonal). ONE home for this
    convention — the train CLI and the viewer's train-while-render must
    optimize against the same domain."""
    omin, omax = scene.outer_shell.bounds()
    extent = omax - omin
    inv_extent = np.where(extent != 0,
                          1.0 / np.where(extent == 0, 1, extent), 0.0)
    radius = 1.5 * float(np.linalg.norm(omax - omin))
    return (jnp.asarray(omin, jnp.float32),
            jnp.asarray(inv_extent, jnp.float32), radius)


def make_optimizer(cfg: TrainConfig):
    if cfg.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(
            cfg.learning_rate, max(1, cfg.steps), alpha=cfg.lr_end_factor)
    else:
        lr = cfg.learning_rate
    return optax.adamw(lr, weight_decay=cfg.weight_decay)


def init_train_state(cfg: TrainConfig, net_config: nbvh.NbvhConfig) -> TrainState:
    params = nbvh.init_params(jax.random.PRNGKey(cfg.seed), net_config)
    opt = make_optimizer(cfg)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.int32(0))


def resolve_fused(cfg: TrainConfig, net_config: nbvh.NbvhConfig):
    """-> (use_fused, interpret) for the lane-grid fused training kernel."""
    if cfg.fused_kernel == "off" or net_config.grid_type != "lane":
        return False, False
    import jax as _jax
    on_tpu = _jax.default_backend() == "tpu"
    if cfg.fused_kernel == "on":
        return True, not on_tpu
    return on_tpu, False


def loss_fn(params, batch, net_config, compute_dtype, fused=False,
            interpret=False):
    if fused:
        from ..ops.lane_grid_train_kernel import apply_train_fused
        outputs = apply_train_fused(params, batch.inputs, net_config,
                                    interpret=interpret)
    else:
        outputs = nbvh.apply(params, batch.inputs, net_config,
                             compute_dtype=compute_dtype)
    return shell_losses(outputs, batch)


def make_train_step(cfg: TrainConfig, net_config: nbvh.NbvhConfig,
                    gt_mesh, outer, inner, outer_min, outer_inv_extent,
                    radius: float, donate: bool = True, mesh=None,
                    dp_axis: str = "dp", global_row=None):
    """Build the jitted (state, key) -> (state, metrics) step: sample a fresh
    segment batch on-device, compute grads, Adam update. With `mesh`, the
    sampled batch is sharding-constrained across `dp_axis` so sampling + loss
    run data-parallel (pair with parallel.shard_train_state for tp).
    global_row: the scene's global-material scalar row (see
    scene_global_row) — the albedo supervision for material_id < 0 hits."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    opt = make_optimizer(cfg)
    # The fused Pallas forward+backward only applies single-device (its grad
    # accumulators are per-kernel; dp/tp sharding keeps the XLA twin, whose
    # collectives XLA inserts from the shardings).
    fused, interp = (False, False) if mesh is not None \
        else resolve_fused(cfg, net_config)

    def grad_step(state: TrainState, batch) -> tuple[TrainState, dict]:
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, net_config,
                                   compute_dtype, fused, interp)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is not None:
        def step(state: TrainState, key):
            batch = sample_segment_batch(
                key, gt_mesh, outer, inner, outer_min, outer_inv_extent,
                cfg.batch_size, radius,
                segments_per_ray=cfg.segments_per_ray, global_row=global_row)
            from ..parallel.shardings import constrain_batch_dp
            return grad_step(state, constrain_batch_dp(batch, mesh, dp_axis))
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    # Single device: TWO dispatches per step (sampler, then grad+update).
    # Keeping them in one jit serializes pathologically at large batches
    # (XLA schedules the sampler's trace kernels and the fused train kernels
    # back-to-back with no overlap: 522 ms vs 69+66 of the parts at B=262k,
    # BASELINE.md round 3); as separate dispatches the async queue hides the
    # per-dispatch RPC floor and batch k+1's sampler overlaps grad k.
    sample_jit = jax.jit(lambda key: sample_segment_batch(
        key, gt_mesh, outer, inner, outer_min, outer_inv_extent,
        cfg.batch_size, radius, segments_per_ray=cfg.segments_per_ray,
        global_row=global_row))
    grad_jit = jax.jit(grad_step,
                       donate_argnums=(0, 1) if donate else (1,))

    def step(state: TrainState, key) -> tuple[TrainState, dict]:
        return grad_jit(state, sample_jit(key))

    return step


def make_train_step_on_batch(cfg: TrainConfig, net_config: nbvh.NbvhConfig):
    """(state, batch) -> (state, metrics), batch supplied externally — the
    entry point for dp-sharded batches (parallel/shardings.py)."""
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    opt = make_optimizer(cfg)

    def step(state: TrainState, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, net_config, compute_dtype)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Checkpointing (orbax) + flat-blob export
# ---------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state: TrainState):
    import orbax.checkpoint as ocp
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        path = os.path.join(ckpt_dir, f"step_{int(state.step)}")
        ckptr.save(path, {"params": state.params,
                          "opt_state": state.opt_state,
                          "step": state.step}, force=True)
    return path


def restore_checkpoint(path: str, cfg: TrainConfig,
                       net_config: nbvh.NbvhConfig) -> TrainState:
    """Restore a train-state checkpoint. The optimizer-state pytree differs
    between constant-LR (stateless scale) and scheduled-LR (step-count state)
    checkpoints, so if the template built from `cfg` doesn't match the stored
    structure the other schedule variant is tried — callers that only need
    params (Renderer.load_weights_from_file) then work on either kind."""
    import dataclasses

    import orbax.checkpoint as ocp
    last_err = None
    for sched in dict.fromkeys([cfg.lr_schedule, "constant", "cosine"]):
        template = init_train_state(dataclasses.replace(cfg, lr_schedule=sched),
                                    net_config)
        try:
            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(
                    os.path.abspath(path),
                    {"params": template.params,
                     "opt_state": template.opt_state,
                     "step": template.step})
            return TrainState(restored["params"], restored["opt_state"],
                              restored["step"])
        except ValueError as e:
            last_err = e
    raise last_err


def export_reference_blob(path: str, state: TrainState,
                          net_config: nbvh.NbvhConfig):
    """Write the reference-compatible flat FP16 checkpoint."""
    nbvh.save_flat_blob(path, state.params, net_config, swap_param_order=True)

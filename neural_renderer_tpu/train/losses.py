"""Training losses for the shell network (SURVEY.md §7 step 9).

BCE-with-logits on presence (output slot 0), L1 on distance (slot 1), cosine
on normal (slots 2:5), L2 on color (slots 5:8). Regression terms are masked
to segments whose ground truth actually intersects; all terms masked to valid
segments.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    presence: float = 1.0
    distance: float = 1.0
    normal: float = 0.5
    color: float = 0.5


def bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def shell_losses(outputs, batch, weights: LossWeights = LossWeights()):
    """outputs: [>=8, B] channel-major network output; batch: SegmentBatch.
    Returns (total, dict of components)."""
    valid = batch.valid.astype(jnp.float32)
    pos = valid * batch.presence
    n_valid = jnp.maximum(valid.sum(), 1.0)
    n_pos = jnp.maximum(pos.sum(), 1.0)

    presence_loss = (bce_with_logits(outputs[0], batch.presence) * valid).sum() / n_valid
    dist_loss = (jnp.abs(outputs[1] - batch.distance) * pos).sum() / n_pos

    pred_n = outputs[2:5]
    pred_n = pred_n / jnp.maximum(jnp.linalg.norm(pred_n, axis=0, keepdims=True), 1e-6)
    cos = jnp.sum(pred_n * batch.normal, axis=0)
    normal_loss = ((1.0 - cos) * pos).sum() / n_pos

    color_loss = (jnp.sum((outputs[5:8] - batch.color) ** 2, axis=0)
                  * pos).sum() / n_pos

    total = (weights.presence * presence_loss + weights.distance * dist_loss
             + weights.normal * normal_loss + weights.color * color_loss)
    return total, {
        "presence": presence_loss,
        "distance": dist_loss,
        "normal": normal_loss,
        "color": color_loss,
        "total": total,
    }

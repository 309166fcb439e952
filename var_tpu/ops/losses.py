"""Loss functions matching the reference's torch criteria."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_distance(x1: jnp.ndarray, x2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """||x1 - x2 + eps||_2 rowwise — torch.nn.functional.pairwise_distance
    semantics (eps added to the difference before the norm)."""
    return jnp.linalg.norm(x1 - x2 + eps, ord=2, axis=-1)


def triplet_margin_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float = 1.0,
) -> jnp.ndarray:
    """torch.nn.TripletMarginLoss(margin, p=2) with mean reduction
    (reference: VAR/pretext_VAR.py:40,64)."""
    d_pos = pairwise_distance(anchor, positive)
    d_neg = pairwise_distance(anchor, negative)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(x, p=2, dim) semantics: x / max(||x||, eps)
    (reference: models/pretext/pretext_base.py:18,23).

    Implemented as x * rsqrt(sum(x^2) + eps^2) — identical within float32
    precision for non-degenerate inputs, but with a finite gradient at
    x == 0 (jnp.linalg.norm's gradient is NaN there, and an exactly-zero
    embedding does occur: the zero 'empty intent' sound through zero-init
    biases)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps * eps)

"""Action distributions with the reference's shape conventions.

Rebuild of models/ppo/distributions.py: FixedCategorical /
FixedNormal(DiagGaussian) / FixedBernoulli as pure functions over a params
dict. Conventions preserved:
- sample() returns (B, 1) for categorical, (B, A) for gaussian/bernoulli;
- log_probs() always returns (B, 1) (summed over action dims);
- entropy() returns (B,);
- mode() = argmax / mean / probs>0.5.

The DiagGaussian's state-independent learned logstd reproduces the
reference's AddBias-on-zeros trick (distributions.py:74-82) as a plain
parameter vector.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LOG_2PI = float(np.log(2.0 * np.pi))


class DistParams(NamedTuple):
    """Distribution activation for one batch: either logits or mean+logstd."""

    kind: str  # static: 'categorical' | 'gaussian' | 'bernoulli'
    logits: jnp.ndarray = None  # (B, A) for categorical/bernoulli
    mean: jnp.ndarray = None  # (B, A) for gaussian
    logstd: jnp.ndarray = None  # (A,) or (B, A)


def sample(dist: DistParams, key) -> jnp.ndarray:
    if dist.kind == "categorical":
        a = jax.random.categorical(key, dist.logits, axis=-1)
        return a[:, None].astype(jnp.int32)
    if dist.kind == "gaussian":
        eps = jax.random.normal(key, dist.mean.shape, dist.mean.dtype)
        return dist.mean + jnp.exp(dist.logstd) * eps
    if dist.kind == "bernoulli":
        u = jax.random.uniform(key, dist.logits.shape)
        return (u < jax.nn.sigmoid(dist.logits)).astype(jnp.float32)
    raise ValueError(dist.kind)


def mode(dist: DistParams) -> jnp.ndarray:
    if dist.kind == "categorical":
        return jnp.argmax(dist.logits, axis=-1)[:, None].astype(jnp.int32)
    if dist.kind == "gaussian":
        return dist.mean
    if dist.kind == "bernoulli":
        return (jax.nn.sigmoid(dist.logits) > 0.5).astype(jnp.float32)
    raise ValueError(dist.kind)


def log_probs(dist: DistParams, actions: jnp.ndarray) -> jnp.ndarray:
    """(B, 1) summed log probability (reference log_probs conventions)."""
    if dist.kind == "categorical":
        logp = jax.nn.log_softmax(dist.logits, axis=-1)
        a = actions.reshape(actions.shape[0]).astype(jnp.int32)
        return jnp.take_along_axis(logp, a[:, None], axis=-1)
    if dist.kind == "gaussian":
        var = jnp.exp(2.0 * dist.logstd)
        lp = -((actions - dist.mean) ** 2) / (2.0 * var) - dist.logstd - 0.5 * LOG_2PI
        return jnp.sum(lp, axis=-1, keepdims=True)
    if dist.kind == "bernoulli":
        lp = actions * jax.nn.log_sigmoid(dist.logits) + (1.0 - actions) * jax.nn.log_sigmoid(
            -dist.logits
        )
        return jnp.sum(lp.reshape(actions.shape[0], -1), axis=-1, keepdims=True)
    raise ValueError(dist.kind)


def entropy(dist: DistParams) -> jnp.ndarray:
    """(B,) entropy (summed over action dims for gaussian/bernoulli)."""
    if dist.kind == "categorical":
        logp = jax.nn.log_softmax(dist.logits, axis=-1)
        p = jnp.exp(logp)
        return -jnp.sum(p * logp, axis=-1)
    if dist.kind == "gaussian":
        ent = 0.5 + 0.5 * LOG_2PI + dist.logstd
        return jnp.sum(jnp.broadcast_to(ent, dist.mean.shape), axis=-1)
    if dist.kind == "bernoulli":
        p = jax.nn.sigmoid(dist.logits)
        ent = -(
            p * jax.nn.log_sigmoid(dist.logits)
            + (1 - p) * jax.nn.log_sigmoid(-dist.logits)
        )
        return jnp.sum(ent, axis=-1)
    raise ValueError(dist.kind)


def orthogonal_dense(features: int, gain: float, name=None) -> nn.Dense:
    """Linear layer with orthogonal weights / zero bias (the reference's
    init() helper, models/ppo/utils.py:31-42)."""
    return nn.Dense(
        features,
        kernel_init=jax.nn.initializers.orthogonal(scale=gain),
        bias_init=jax.nn.initializers.zeros,
        name=name,
    )


class CategoricalHead(nn.Module):
    """Linear(num_inputs -> n) with gain 0.01 (reference: distributions.py:49-62)."""

    num_outputs: int

    @nn.compact
    def __call__(self, x) -> DistParams:
        logits = orthogonal_dense(self.num_outputs, 0.01)(x)
        return DistParams(kind="categorical", logits=logits)


class DiagGaussianHead(nn.Module):
    """fc_mean + learned state-independent logstd (reference: distributions.py:65-84)."""

    num_outputs: int

    @nn.compact
    def __call__(self, x) -> DistParams:
        mean = orthogonal_dense(self.num_outputs, 1.0)(x)
        logstd = self.param("logstd", jax.nn.initializers.zeros, (self.num_outputs,))
        return DistParams(kind="gaussian", mean=mean, logstd=logstd)


class BernoulliHead(nn.Module):
    num_outputs: int

    @nn.compact
    def __call__(self, x) -> DistParams:
        logits = orthogonal_dense(self.num_outputs, 1.0)(x)
        return DistParams(kind="bernoulli", logits=logits)


def make_head(action_space) -> nn.Module:
    """Head by action-space class, as the reference Policy does
    (models/ppo/model.py:33-43)."""
    from var_tpu.envs.spaces import Box, Discrete, MultiBinary

    if isinstance(action_space, Discrete):
        return CategoricalHead(action_space.n)
    if isinstance(action_space, Box):
        return DiagGaussianHead(int(np.prod(action_space.shape)))
    if isinstance(action_space, MultiBinary):
        return BernoulliHead(action_space.n)
    raise NotImplementedError(type(action_space))

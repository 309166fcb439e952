"""Return / advantage computation as reverse lax.scan.

All four variants of the reference's RolloutStorage.compute_returns
(reference: models/ppo/storage.py:89-128): {GAE, discounted} x
{proper-time-limits via bad_masks, plain}. Inputs are the (T, N, 1)-shaped
rollout tensors flattened to (T, N).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_returns(
    rewards: jnp.ndarray,       # (T, N)
    value_preds: jnp.ndarray,   # (T+1, N) — [T] overwritten with next_value by caller
    masks: jnp.ndarray,         # (T+1, N) 1.0 = not done at that boundary
    bad_masks: jnp.ndarray,     # (T+1, N) 0.0 = time-limit truncation
    next_value: jnp.ndarray,    # (N,)
    gamma: float,
    gae_lambda: float,
    use_gae: bool = True,
    use_proper_time_limits: bool = False,
):
    """Returns (returns (T, N), value_preds (T+1, N) with [T]=next_value)."""
    T = rewards.shape[0]
    value_preds = value_preds.at[T].set(next_value)

    if use_gae:
        def step(gae, t_in):
            r, v, v_next, m_next, bm_next = t_in
            delta = r + gamma * v_next * m_next - v
            gae = delta + gamma * gae_lambda * m_next * gae
            if use_proper_time_limits:
                gae = gae * bm_next
            return gae, gae + v

        xs = (rewards, value_preds[:-1], value_preds[1:], masks[1:], bad_masks[1:])
        _, returns = jax.lax.scan(step, jnp.zeros_like(next_value), xs, reverse=True)
    else:
        def step(ret_next, t_in):
            r, v, m_next, bm_next = t_in
            ret = ret_next * gamma * m_next + r
            if use_proper_time_limits:
                ret = ret * bm_next + (1.0 - bm_next) * v
            return ret, ret

        xs = (rewards, value_preds[:-1], masks[1:], bad_masks[1:])
        _, returns = jax.lax.scan(step, next_value, xs, reverse=True)

    return returns, value_preds

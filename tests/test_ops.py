"""Tests for losses, GAE variants, and running statistics."""
import numpy as np
import torch

import jax.numpy as jnp

from var_tpu.ops.gae import compute_returns
from var_tpu.ops.losses import l2_normalize, triplet_margin_loss
from var_tpu.ops.running_stats import (
    ReturnNormalizer,
    RunningMeanStd,
    normalize_rewards,
    rms_update,
)


def test_triplet_loss_matches_torch():
    rng = np.random.RandomState(0)
    a, p, n = [rng.randn(16, 3).astype(np.float32) for _ in range(3)]
    golden = torch.nn.TripletMarginLoss(margin=1.0, p=2)(
        torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n)
    ).item()
    ours = float(triplet_margin_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), 1.0))
    np.testing.assert_allclose(ours, golden, rtol=1e-5)


def test_l2_normalize_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 5).astype(np.float32)
    golden = torch.nn.functional.normalize(torch.from_numpy(x), p=2, dim=1).numpy()
    np.testing.assert_allclose(np.asarray(l2_normalize(jnp.asarray(x))), golden,
                               rtol=1e-6, atol=1e-6)


def _reference_compute_returns(rewards, value_preds, masks, bad_masks, next_value,
                               gamma, lam, use_gae, proper):
    """Direct numpy transcription of the reference loops
    (models/ppo/storage.py:89-128)."""
    T, N = rewards.shape
    value_preds = value_preds.copy()
    returns = np.zeros((T + 1, N))
    if use_gae:
        value_preds[-1] = next_value
        gae = np.zeros(N)
        for step in reversed(range(T)):
            delta = (rewards[step] + gamma * value_preds[step + 1] * masks[step + 1]
                     - value_preds[step])
            gae = delta + gamma * lam * masks[step + 1] * gae
            if proper:
                gae = gae * bad_masks[step + 1]
            returns[step] = gae + value_preds[step]
    else:
        returns[-1] = next_value
        for step in reversed(range(T)):
            if proper:
                returns[step] = ((returns[step + 1] * gamma * masks[step + 1]
                                  + rewards[step]) * bad_masks[step + 1]
                                 + (1 - bad_masks[step + 1]) * value_preds[step])
            else:
                returns[step] = returns[step + 1] * gamma * masks[step + 1] + rewards[step]
    return returns[:-1]


def test_gae_all_variants_match_reference():
    rng = np.random.RandomState(2)
    T, N = 12, 4
    rewards = rng.randn(T, N).astype(np.float32)
    value_preds = rng.randn(T + 1, N).astype(np.float32)
    masks = (rng.rand(T + 1, N) > 0.2).astype(np.float32)
    bad_masks = (rng.rand(T + 1, N) > 0.15).astype(np.float32)
    next_value = rng.randn(N).astype(np.float32)

    for use_gae in (True, False):
        for proper in (True, False):
            golden = _reference_compute_returns(
                rewards, value_preds, masks, bad_masks, next_value,
                0.99, 0.95, use_gae, proper)
            ours, _ = compute_returns(
                jnp.asarray(rewards), jnp.asarray(value_preds), jnp.asarray(masks),
                jnp.asarray(bad_masks), jnp.asarray(next_value),
                0.99, 0.95, use_gae=use_gae, use_proper_time_limits=proper)
            np.testing.assert_allclose(
                np.asarray(ours), golden, rtol=1e-4, atol=1e-4,
                err_msg=f"use_gae={use_gae} proper={proper}")


def test_rms_update_matches_streaming_moments():
    rng = np.random.RandomState(3)
    state = RunningMeanStd.create(shape=())
    seen = []
    for _ in range(10):
        batch = rng.randn(32) * 3 + 1.5
        seen.append(batch)
        state = rms_update(state, batch)
    allx = np.concatenate(seen)
    np.testing.assert_allclose(state.mean, allx.mean(), rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(state.var, allx.var(), rtol=1e-4, atol=1e-4)


def test_reward_normalizer_clips_and_resets():
    state = ReturnNormalizer.create(num_envs=3, gamma=0.9)
    rews = np.array([1.0, -2.0, 0.5])
    news = np.array([False, True, False])
    state, out = normalize_rewards(state, rews, news)
    assert out.shape == (3,)
    assert np.all(np.abs(out) <= 10.0)
    assert state.ret[1] == 0.0  # reset where done
    assert state.ret[0] != 0.0

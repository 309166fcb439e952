"""Rollout storage as (T+1, N, ...) arrays.

Rebuild of the reference RolloutStorage (reference: models/ppo/storage.py:13-128):
dict observations (keys filtered by config.RLObsIgnore), rewards, value
predictions, returns, action log-probs, actions, masks and bad_masks,
with insert / after_update, and compute_returns delegating to the
reverse-scan GAE ops. Buffers live in host numpy during the rollout
(simulators are host-side) and move to device once per update as a single
pytree — replacing the reference's per-step torch copies.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict

import numpy as np

from var_tpu.envs import spaces
from var_tpu.ops.gae import compute_returns as gae_compute_returns

import jax.numpy as jnp


class RolloutStorage:
    def __init__(self, num_steps: int, num_processes: int, obs_space,
                 action_space, recurrent_hidden_state_size: int, config):
        self.num_steps = num_steps
        self.num_processes = num_processes
        self.config = config

        self.obs: Dict[str, np.ndarray] = OrderedDict()
        ignore = set(getattr(config, "RLObsIgnore", ()))
        for key, space in obs_space.items():
            if key in ignore:
                continue
            # keep each key's dtype (uint8 pixel keys stay uint8 -> 4x less
            # memory and per-update transfer; the policy normalizes on device)
            self.obs[key] = np.zeros(
                (num_steps + 1, num_processes) + tuple(space.shape),
                space.dtype)

        self.recurrent_hidden_states = np.zeros(
            (num_steps + 1, num_processes, recurrent_hidden_state_size),
            np.float32)
        self.rewards = np.zeros((num_steps, num_processes, 1), np.float32)
        self.value_preds = np.zeros((num_steps + 1, num_processes, 1), np.float32)
        self.returns = np.zeros((num_steps + 1, num_processes, 1), np.float32)
        self.action_log_probs = np.zeros((num_steps, num_processes, 1), np.float32)
        if isinstance(action_space, spaces.Discrete):
            self.actions = np.zeros((num_steps, num_processes, 1), np.int32)
        else:
            self.actions = np.zeros(
                (num_steps, num_processes, action_space.shape[0]), np.float32)
        self.masks = np.ones((num_steps + 1, num_processes, 1), np.float32)
        self.bad_masks = np.ones((num_steps + 1, num_processes, 1), np.float32)
        self.step = 0

    def set_first_obs(self, obs: Dict[str, np.ndarray]):
        for key in self.obs:
            self.obs[key][0] = obs[key]

    def insert(self, obs, recurrent_hidden_states, actions, action_log_probs,
               value_preds, rewards, masks, bad_masks):
        s = self.step
        for key in self.obs:
            self.obs[key][s + 1] = obs[key]
        self.recurrent_hidden_states[s + 1] = recurrent_hidden_states
        self.actions[s] = actions
        self.action_log_probs[s] = action_log_probs
        self.value_preds[s] = value_preds
        self.rewards[s] = np.asarray(rewards).reshape(self.num_processes, 1)
        self.masks[s + 1] = masks
        self.bad_masks[s + 1] = bad_masks
        self.step = (self.step + 1) % self.num_steps

    def after_update(self):
        for key in self.obs:
            self.obs[key][0] = self.obs[key][-1]
        self.recurrent_hidden_states[0] = self.recurrent_hidden_states[-1]
        self.masks[0] = self.masks[-1]
        self.bad_masks[0] = self.bad_masks[-1]

    def compute_returns(self, next_value, use_gae, gamma, gae_lambda,
                        use_proper_time_limits=False):
        returns, value_preds = gae_compute_returns(
            jnp.asarray(self.rewards[..., 0]),
            jnp.asarray(self.value_preds[..., 0]),
            jnp.asarray(self.masks[..., 0]),
            jnp.asarray(self.bad_masks[..., 0]),
            jnp.asarray(np.asarray(next_value).reshape(-1)),
            gamma, gae_lambda, use_gae, use_proper_time_limits,
        )
        self.returns[:-1] = np.asarray(returns)[..., None]
        self.value_preds[-1] = np.asarray(value_preds)[-1][..., None]

    def device_batch(self):
        """The full rollout as a device-ready pytree for the jitted PPO
        update (one transfer per update)."""
        return {
            "obs": {k: jnp.asarray(v[:-1]) for k, v in self.obs.items()},
            "rnn_hx0": jnp.asarray(self.recurrent_hidden_states[0]),
            "actions": jnp.asarray(self.actions),
            "value_preds": jnp.asarray(self.value_preds[:-1, :, 0]),
            "returns": jnp.asarray(self.returns[:-1, :, 0]),
            "masks": jnp.asarray(self.masks[:-1, :, 0]),
            "old_log_probs": jnp.asarray(self.action_log_probs[:, :, 0]),
        }

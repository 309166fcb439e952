"""Fused rollout engine: VAR reward + policy act in ONE device call per step.

The reference's rollout makes two separate device round-trips per env step
— frozen-VAR inference inside the reward wrapper (vec_pretext_normalize.py:
82-94) and the policy act (RL.py:148-160) — and re-transfers the processed
float32 obs dict both times. This engine fuses them: given the raw env
batch (uint8 images/occupancy + goal-sound sentinel state), a single jitted
program computes

    image embeddings -> goal-embedding cache select -> VAR reward
    -> processed policy obs -> value/action/log-prob -> next GRU state

so each env step costs one host->device transfer of uint8 pixels plus one
kernel launch. Return-RMS normalization stays host-side (numpy, matches
the wrapper).

Three rollout tiers share these semantics: the wrapper path
(var_tpu/rl/reward.py, the oracle), this fused engine (one device call,
host-resident storage), and the device-resident engine RLTrainer's
fusedRollout path actually uses (var_tpu/rl/rollout_device.py: the whole
rollout lives in donated device buffers, one readback per step).
"""
from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.models.distributions import log_probs, mode, sample
from var_tpu.ops.running_stats import ReturnNormalizer, normalize_rewards


class FusedStep(NamedTuple):
    value: jnp.ndarray
    action: jnp.ndarray
    action_log_prob: jnp.ndarray
    rnn_hx: jnp.ndarray
    image_feat: jnp.ndarray
    goal_feat: jnp.ndarray
    reward: jnp.ndarray  # raw VAR reward (pre-normalization)


class FusedRolloutEngine:
    def __init__(self, var_model, var_params, policy, config,
                 num_envs: int, ret_norm: bool = True):
        self.var_model = var_model
        self.var_params = var_params
        self.policy = policy
        self.config = config
        self.num_envs = num_envs
        self.cached_goal = np.zeros(
            (num_envs, config.representationDim), np.float32)
        self.ret_norm = (ReturnNormalizer.create(num_envs, config.RLGamma)
                        if ret_norm else None)
        self.is_arm = config.name == "ArmConfig"
        # sound-sound reward coefficient (reference:
        # vec_pretext_normalize.py:96-101); 0/False drops the
        # current_sound encode at trace time
        self.sound_sound = float(
            getattr(config, "RLRewardSoundSound", 0.0) or 0.0)

    # -- the fused program ---------------------------------------------------

    def _sound_sound_term(self, var_params, current_sound, goal_feat):
        if not self.sound_sound:
            return 0.0
        _, cur_feat = self.var_model.apply(
            {"params": var_params}, current_sound,
            method=self.var_model.encode_sound)
        return self.sound_sound * jnp.sum(cur_feat * goal_feat, axis=1)

    @functools.partial(jax.jit, static_argnums=(0, 12))
    def _step(self, var_params, policy_params, image_u8, goal_sound,
              fresh_mask, cached_goal, extra, current_sound, env_reward,
              rnn_hx, masks, deterministic, key):
        """extra: robot_pose (arm) or occupancy u8 (ai2thor)."""
        image = image_u8.astype(jnp.float32) * (1.0 / 255.0)
        _, image_feat = self.var_model.apply(
            {"params": var_params}, image, method=self.var_model.encode_image)
        safe = jnp.where(jnp.isfinite(goal_sound), goal_sound, 0.0)
        _, sound_feat = self.var_model.apply(
            {"params": var_params}, safe, method=self.var_model.encode_sound)
        goal_feat = jnp.where(fresh_mask[:, None], sound_feat, cached_goal)

        D = self.config.representationDim
        reward = (jnp.sum(image_feat[:, :D] * goal_feat, axis=1)
                  + self._sound_sound_term(var_params, current_sound, goal_feat)
                  + env_reward)

        if self.is_arm:
            obs = OrderedDict(
                robot_pose=extra, goal_sound_feat=goal_feat,
                image=image_u8, image_feat=image_feat)
        else:
            obs = OrderedDict(
                occupancy=extra, goal_sound_feat=goal_feat,
                image=image_u8, image_feat=image_feat)
        value, dist, new_hx = self.policy.apply(
            {"params": policy_params}, obs, rnn_hx, masks, 1)
        action = mode(dist) if deterministic else sample(dist, key)
        return FusedStep(value, action, log_probs(dist, action), new_hx,
                         image_feat, goal_feat, reward)

    @functools.partial(jax.jit, static_argnums=(0, 12))
    def _step_cached(self, var_params, policy_params, image_u8, goal_sound,
                     fresh_mask, cached_goal, extra, current_sound,
                     env_reward, rnn_hx, masks, deterministic, key):
        """Variant skipping the goal-sound encoder entirely (all rows
        cached — the common case after step 0)."""
        del goal_sound, fresh_mask
        image = image_u8.astype(jnp.float32) * (1.0 / 255.0)
        _, image_feat = self.var_model.apply(
            {"params": var_params}, image, method=self.var_model.encode_image)
        goal_feat = cached_goal
        D = self.config.representationDim
        reward = (jnp.sum(image_feat[:, :D] * goal_feat, axis=1)
                  + self._sound_sound_term(var_params, current_sound, goal_feat)
                  + env_reward)
        if self.is_arm:
            obs = OrderedDict(
                robot_pose=extra, goal_sound_feat=goal_feat,
                image=image_u8, image_feat=image_feat)
        else:
            obs = OrderedDict(
                occupancy=extra, goal_sound_feat=goal_feat,
                image=image_u8, image_feat=image_feat)
        value, dist, new_hx = self.policy.apply(
            {"params": policy_params}, obs, rnn_hx, masks, 1)
        action = mode(dist) if deterministic else sample(dist, key)
        return FusedStep(value, action, log_probs(dist, action), new_hx,
                         image_feat, goal_feat, reward)

    # -- host driver ---------------------------------------------------------

    def process_and_act(self, policy_params, raw_obs, env_reward, news,
                        rnn_hx, masks, key, deterministic=False):
        """One fused step over the raw env batch. Returns
        (processed_obs_dict for storage, normalized reward, raw reward,
        FusedStep)."""
        goal = np.asarray(raw_obs["goal_sound"], dtype=np.float32)
        fresh = np.isfinite(goal.reshape(self.num_envs, -1)[:, 0])
        extra_key = "robot_pose" if self.is_arm else "occupancy"
        extra = jnp.asarray(
            np.asarray(raw_obs[extra_key], np.float32) if self.is_arm
            else raw_obs[extra_key])
        use_sound = bool(fresh.any())
        fn = self._step if use_sound else self._step_cached
        if use_sound:
            goal_dev = jnp.asarray(goal)
        else:  # the cached variant never reads it: skip the upload
            goal_dev = jnp.zeros((1,), jnp.float32)
        if self.sound_sound:
            cur_dev = jnp.asarray(
                np.asarray(raw_obs["current_sound"], np.float32))
        else:
            cur_dev = jnp.zeros((1,), jnp.float32)
        out = fn(
            self.var_params, policy_params,
            jnp.asarray(raw_obs["image"]), goal_dev,
            jnp.asarray(fresh), jnp.asarray(self.cached_goal), extra, cur_dev,
            jnp.asarray(np.asarray(env_reward, np.float32)),
            rnn_hx, masks, deterministic, key)
        self.cached_goal = np.asarray(out.goal_feat)

        reward = np.asarray(out.reward)
        if self.ret_norm is not None:
            self.ret_norm, norm_reward = normalize_rewards(
                self.ret_norm, reward, news)
        else:
            norm_reward = reward

        processed = OrderedDict()
        if self.is_arm:
            processed["robot_pose"] = np.asarray(raw_obs["robot_pose"],
                                                 np.float32)
        else:
            processed["occupancy"] = np.asarray(raw_obs["occupancy"])
        processed["goal_sound_feat"] = self.cached_goal.copy()
        processed["image"] = np.asarray(raw_obs["image"])
        processed["image_feat"] = np.asarray(out.image_feat)
        return processed, norm_reward.astype(np.float32), reward, out

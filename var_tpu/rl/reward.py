"""VAR-in-the-loop reward wrapper: batched frozen-VAR inference on device.

Rebuild of VecPretextNormalize (reference:
Envs/vec_env/vec_pretext_normalize.py:8-146):

- every step, run the frozen VAR over the env batch on the TPU (one jitted
  call) and rewrite obs + reward:
    reward = dot(image_feat[:, :D], goal_sound_feat)
             + RLRewardSoundSound * dot(current_sound_feat, goal_sound_feat)
             + envReward                       (vec_pretext_normalize.py:96-101)
- rebuild the policy obs dict per env family
  (arm: robot_pose/goal_sound_feat/image/image_feat;
   ai2thor: occupancy/goal_sound_feat/image/image_feat)
  (vec_pretext_normalize.py:104-146);
- baselines-style discounted-return RMS normalization, clip +/-10
  (vec_pretext_normalize.py:55-61), raw reward kept as origStepReward.

The reference's hidden goal-embedding cache (model.self.cached_sound +
the env's inf sentinel, pretext_base.py:26-32 / RL_env_VAR.py:510) becomes
EXPLICIT wrapper state: rows whose goal_sound is the inf sentinel reuse
self.cached_goal_feat; fresh rows are re-encoded. The sound encoder is
skipped entirely on steps where every row is cached (the common case —
all envs emit the sentinel after step 0), decided host-side so both jit
variants stay compiled.

STATUS: compatibility fallback. This wrapper preserves the reference's
per-step host<->device round trip, which on a tunneled chip costs ~50 ms
p50 (BENCH r3) against a ~5 ms budget at the reference's 8-env scale.
Production training uses the fused engines instead — rl/rollout_device.py
(one program per step, one readback) and rl/device_sim.py (whole rollout
on device) — selected via fusedRollout/RLDeviceSimRollout (default on);
this path remains for host sims that need the exact wrapper protocol and
as the semantics reference the fused engines are parity-tested against.
"""
from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.envs.vec.base import VecEnvWrapper
from var_tpu.ops.running_stats import ReturnNormalizer, normalize_rewards


class VecVARReward(VecEnvWrapper):
    def __init__(self, venv, model, params, config, ob=False, ret=True,
                 gamma=0.99, cliprew=10.0, epsilon=1e-8):
        super().__init__(venv)
        self.config = config
        self.model = model
        self.params = params
        self.ret_norm = (
            ReturnNormalizer.create(venv.num_envs, gamma, cliprew, epsilon)
            if ret else None
        )
        self.origStepReward = np.zeros(venv.num_envs)
        self.cached_goal_feat = np.zeros(
            (venv.num_envs, config.representationDim), dtype=np.float32)
        from var_tpu.utils.profiling import PhaseTimer

        self.timer = PhaseTimer()  # 'var_reward' p50 ms tracked per step
        self._rt_plot = None  # realTimeVec live quiver (lazy)
        self.processing_func = {
            "ArmConfig": self._process_arm,
            "AI2ThorConfig": self._process_ai2thor,
        }[config.name]

    def _maybe_draw_realtime(self, image_feat, goal_feat):
        """realTimeVec: live image/goal embedding quivers every step
        (reference: vec_pretext_normalize.py:116-119,138-141 drawArrows);
        interactive window with a display, frame dump headless."""
        if not getattr(self.config, "realTimeVec", False):
            return
        if self._rt_plot is None:
            from var_tpu.utils.plotting import RealTimeEmbeddingPlot

            self._rt_plot = RealTimeEmbeddingPlot(
                None, self.config.representationDim)
        self._rt_plot.draw_arrows(image_feat, goal_feat)
        if not self._rt_plot.interactive:
            import os

            save_dir = getattr(self.config, "RLModelSaveDir", None)
            if save_dir:
                os.makedirs(save_dir, exist_ok=True)
                self._rt_plot.save(
                    os.path.join(save_dir, "realtime_vec.png"))

    # -- jitted VAR inference -------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _infer_with_sound(self, params, image, goal_sound, fresh_mask,
                          cached_goal):
        """Encode image always; encode goal sound and select per-row between
        fresh embedding and cache. Sentinel rows are sanitized to zeros
        before the encoder so no inf/nan propagates. Images arrive uint8
        and are normalized here (transfer stays 4x smaller)."""
        image = image.astype(jnp.float32) * (1.0 / 255.0)
        _, image_feat = self.model.apply(
            {"params": params}, image, method=self.model.encode_image)
        safe = jnp.where(jnp.isfinite(goal_sound), goal_sound, 0.0)
        _, sound_feat = self.model.apply(
            {"params": params}, safe, method=self.model.encode_sound)
        goal_feat = jnp.where(fresh_mask[:, None], sound_feat, cached_goal)
        return image_feat, goal_feat

    @functools.partial(jax.jit, static_argnums=0)
    def _infer_image_only(self, params, image):
        image = image.astype(jnp.float32) * (1.0 / 255.0)
        _, image_feat = self.model.apply(
            {"params": params}, image, method=self.model.encode_image)
        return image_feat

    @functools.partial(jax.jit, static_argnums=0)
    def _infer_sound(self, params, sound):
        _, feat = self.model.apply(
            {"params": params}, sound, method=self.model.encode_sound)
        return feat

    # -- embedding + reward (reference getEmbeddings/calcReward) ----------------

    def _get_embeddings(self, obs):
        image = jnp.asarray(obs["image"])  # uint8; normalized on device
        goal = obs["goal_sound"]
        # host-side sentinel check (cheap: one corner value per env row)
        fresh = np.isfinite(
            np.asarray(goal).reshape(self.num_envs, -1)[:, 0])
        if fresh.any():
            image_feat, goal_feat = self._infer_with_sound(
                self.params, image, jnp.asarray(goal, dtype=jnp.float32),
                jnp.asarray(fresh), jnp.asarray(self.cached_goal_feat))
            self.cached_goal_feat = np.asarray(goal_feat)
        else:
            image_feat = self._infer_image_only(self.params, image)
            goal_feat = jnp.asarray(self.cached_goal_feat)
        current_feat = 0.0
        if self.config.RLRewardSoundSound:
            current_feat = np.asarray(self._infer_sound(
                self.params, jnp.asarray(obs["current_sound"], jnp.float32)))
        return np.asarray(image_feat), np.asarray(goal_feat), current_feat

    def _calc_reward(self, env_reward, image_feat, goal_feat, current_feat):
        D = self.config.representationDim
        img_sound = np.sum(image_feat[:, :D] * goal_feat, axis=1)
        snd_snd = np.sum(np.asarray(current_feat) * goal_feat, axis=1) \
            if self.config.RLRewardSoundSound else 0.0
        return (img_sound + snd_snd * self.config.RLRewardSoundSound
                + env_reward)

    def _process_arm(self, obs, env_reward):
        image_feat, goal_feat, current_feat = self._get_embeddings(obs)
        reward = self._calc_reward(env_reward, image_feat, goal_feat, current_feat)
        self._maybe_draw_realtime(image_feat, goal_feat)
        s = OrderedDict(
            [
                ("robot_pose", obs["robot_pose"].astype(np.float32)),
                ("goal_sound_feat", goal_feat),
                ("image", obs["image"].astype(np.float32) / 255.0),
                ("image_feat", image_feat),
            ]
        )
        return s, reward

    def _process_ai2thor(self, obs, env_reward):
        image_feat, goal_feat, current_feat = self._get_embeddings(obs)
        reward = self._calc_reward(env_reward, image_feat, goal_feat, current_feat)
        self._maybe_draw_realtime(image_feat, goal_feat)
        s = OrderedDict(
            [
                ("occupancy", obs["occupancy"].astype(np.float32) / 255.0),
                ("goal_sound_feat", goal_feat),
                ("image", obs["image"].astype(np.float32) / 255.0),
                ("image_feat", image_feat),
            ]
        )
        return s, reward

    # -- VecEnv API ---------------------------------------------------------------

    def step_wait(self):
        obs, env_rews, news, infos = self.venv.step_wait()
        with self.timer.phase("var_reward"):
            obs, rews = self.processing_func(obs, env_rews)
        self.origStepReward = np.asarray(rews).copy()
        if self.ret_norm is not None:
            self.ret_norm, rews = normalize_rewards(self.ret_norm, rews, news)
        return obs, np.asarray(rews, dtype=np.float32), news, infos

    def reset(self):
        if self.ret_norm is not None:
            self.ret_norm = self.ret_norm._replace(
                ret=np.zeros(self.num_envs))
        obs = self.venv.reset()
        obs, _ = self.processing_func(obs, np.zeros((self.num_envs,)))
        return obs

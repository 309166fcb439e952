"""Device-resident rollout collection: one readback per env step.

Profiling through this host<->device link shows a ~33 ms fixed latency on
every device->host readback (async dispatch ~2 ms), so rollout throughput
is set by the number of synchronizations, not by compute. The wrapper and
simple-fused paths read back values/log-probs/hidden-states/features every
step; here the ENTIRE rollout lives in device buffers:

- the fused step program (VAR embeddings -> reward -> on-device return-RMS
  normalization -> policy act) writes obs/features/action/value/log-prob/
  mask slices into donated (T+1, N, ...) buffers at the current index;
- the only readback is one packed (N, A+1) array: the action the host env
  needs, plus the raw reward for episode logging;
- GAE and the PPO update then consume the buffers directly — zero
  re-upload of the rollout at update time;
- after_update is a jitted tail->head copy.

Per step the host pays: one uint8 image upload, one packed small upload,
one dispatch, one readback. The return-RMS runs in float32 on device
(the reference keeps float64 on host — the normalizer is a heuristic
scale; the wrapper path retains exact reference semantics).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.models.distributions import log_probs, mode, sample
from var_tpu.ops.gae import compute_returns


class DeviceRollout(NamedTuple):
    """All-device rollout state. Leading axis T+1 for boundary tensors."""

    obs_image: jnp.ndarray      # (T+1, N, 3, H, W) uint8
    obs_extra: jnp.ndarray      # (T+1, N, ...) robot_pose f32 | occupancy u8
    obs_image_feat: jnp.ndarray  # (T+1, N, D)
    obs_goal_feat: jnp.ndarray   # (T+1, N, D)
    rnn_hx: jnp.ndarray         # (T+1, N, H)
    actions: jnp.ndarray        # (T, N, A) f32 | (T, N, 1) i32
    action_log_probs: jnp.ndarray  # (T, N)
    values: jnp.ndarray         # (T, N)
    rewards: jnp.ndarray        # (T, N) normalized
    masks: jnp.ndarray          # (T+1, N)
    bad_masks: jnp.ndarray      # (T+1, N)
    # carried step state
    cached_goal: jnp.ndarray    # (N, D)
    prev_value: jnp.ndarray     # (N,)
    prev_log_prob: jnp.ndarray  # (N,)
    prev_action: jnp.ndarray    # (N, A)
    prev_hx: jnp.ndarray        # (N, H) hx produced by the last act
    # on-device return normalizer (float32)
    ret: jnp.ndarray            # (N,)
    rms_mean: jnp.ndarray       # ()
    rms_var: jnp.ndarray        # ()
    rms_count: jnp.ndarray      # ()


class DeviceRolloutEngine:
    def __init__(self, var_model, var_params, policy, config, num_steps: int,
                 num_envs: int, extra_key: str, extra_shape, extra_dtype,
                 action_shape, action_dtype, gamma: float = 0.99,
                 cliprew: float = 10.0, epsilon: float = 1e-8, mesh=None,
                 deterministic: bool = False):
        self.var_model = var_model
        self.var_params = var_params
        self.policy = policy
        self.config = config
        self.T = num_steps
        self.N = num_envs
        self.extra_key = extra_key  # 'robot_pose' | 'occupancy'
        self.gamma = gamma
        self.cliprew = cliprew
        self.epsilon = epsilon
        self.is_arm = extra_key == "robot_pose"
        # deterministic=True selects the distribution mode instead of a
        # sample in every fused act (resolved at trace time) — the fused
        # EVAL path (reference: RL.py act(deterministic=RLDeterministic))
        self.deterministic = bool(deterministic)
        # sound-sound reward coefficient (reference:
        # vec_pretext_normalize.py:96-101 — RLRewardSoundSound *
        # dot(current_sound_feat, goal_sound_feat)); 0/False disables the
        # current_sound encode entirely (resolved at trace time).
        self.sound_sound = float(
            getattr(config, "RLRewardSoundSound", 0.0) or 0.0)
        # Eager D2H copies overlap the readback latency with host work on
        # co-located chips, but the tunneled 'axon' backend mishandles
        # copy_to_host_async (measured: it turns the following 33 ms
        # readback into an ~80 s stall). The tunnel masquerades as a
        # regular 'tpu' platform, so detect it via JAX_PLATFORMS.
        import os

        self._async_copy = "axon" not in os.environ.get("JAX_PLATFORMS", "")
        self._reader = None  # lazy ThreadPoolExecutor for tunneled readbacks
        # multi-chip: shard every buffer's env axis over the mesh 'dp' axis
        # (the time axis stays unsharded); XLA inserts the cross-chip
        # reductions for the return-RMS statistics and the PPO grads
        self.mesh = mesh
        if mesh is not None:
            import jax.sharding as shd

            self._env_axis0 = shd.NamedSharding(mesh, shd.PartitionSpec("dp"))
            self._env_axis1 = shd.NamedSharding(
                mesh, shd.PartitionSpec(None, "dp"))
            self._rep = shd.NamedSharding(mesh, shd.PartitionSpec())
        else:
            self._env_axis0 = self._env_axis1 = self._rep = None

        D = config.representationDim
        H = policy.recurrent_hidden_state_size
        T, N = num_steps, num_envs
        img_dim = tuple(config.img_dim)
        self.buffers = DeviceRollout(
            obs_image=jnp.zeros((T + 1, N) + img_dim, jnp.uint8),
            obs_extra=jnp.zeros((T + 1, N) + tuple(extra_shape), extra_dtype),
            obs_image_feat=jnp.zeros((T + 1, N, D), jnp.float32),
            obs_goal_feat=jnp.zeros((T + 1, N, D), jnp.float32),
            rnn_hx=jnp.zeros((T + 1, N, H), jnp.float32),
            actions=jnp.zeros((T, N) + tuple(action_shape), action_dtype),
            action_log_probs=jnp.zeros((T, N), jnp.float32),
            values=jnp.zeros((T, N), jnp.float32),
            rewards=jnp.zeros((T, N), jnp.float32),
            masks=jnp.ones((T + 1, N), jnp.float32),
            bad_masks=jnp.ones((T + 1, N), jnp.float32),
            cached_goal=jnp.zeros((N, D), jnp.float32),
            prev_value=jnp.zeros((N,), jnp.float32),
            prev_log_prob=jnp.zeros((N,), jnp.float32),
            prev_action=jnp.zeros((N,) + tuple(action_shape), action_dtype),
            prev_hx=jnp.zeros((N, H), jnp.float32),
            ret=jnp.zeros((N,), jnp.float32),
            rms_mean=jnp.zeros((), jnp.float32),
            rms_var=jnp.ones((), jnp.float32),
            rms_count=jnp.asarray(1e-4, jnp.float32),
        )
        if self.mesh is not None:
            self.buffers = DeviceRollout(**{
                name: jax.device_put(v, self._sharding_for(name))
                for name, v in self.buffers._asdict().items()
            })

    # env axis position per field (explicit — shapes can be ambiguous)
    _ENV_AXIS0_FIELDS = frozenset(
        ("cached_goal", "prev_value", "prev_log_prob", "prev_action",
         "prev_hx", "ret"))
    _SCALAR_FIELDS = frozenset(("rms_mean", "rms_var", "rms_count"))

    def _sharding_for(self, name: str):
        if name in self._SCALAR_FIELDS:
            return self._rep
        if name in self._ENV_AXIS0_FIELDS:
            return self._env_axis0
        return self._env_axis1  # (T|T+1, N, ...) tensors

    def _put_host(self, x, env_axis0=True):
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(
            np.asarray(x), self._env_axis0 if env_axis0 else self._rep)

    # -- device programs -----------------------------------------------------

    def _embed_and_act(self, policy_params, image_u8, extra, goal_feat,
                       image_feat, hx, masks, key, deterministic):
        obs = {
            self.extra_key: extra,
            "goal_sound_feat": goal_feat,
            "image": image_u8,
            "image_feat": image_feat,
        }
        value, dist, new_hx = self.policy.apply(
            {"params": policy_params}, obs, hx, masks, 1)
        action = mode(dist) if deterministic else sample(dist, key)
        return value[:, 0], action, log_probs(dist, action)[:, 0], new_hx

    def _encode(self, var_params, image_u8, goal_sound, fresh, cached_goal,
                use_sound: bool):
        image = image_u8.astype(jnp.float32) * (1.0 / 255.0)
        _, image_feat = self.var_model.apply(
            {"params": var_params}, image, method=self.var_model.encode_image)
        if use_sound:
            safe = jnp.where(jnp.isfinite(goal_sound), goal_sound, 0.0)
            _, sound_feat = self.var_model.apply(
                {"params": var_params}, safe,
                method=self.var_model.encode_sound)
            goal_feat = jnp.where(fresh[:, None], sound_feat, cached_goal)
        else:
            goal_feat = cached_goal
        return image_feat, goal_feat

    @functools.partial(jax.jit, static_argnums=(0, 11), donate_argnums=1)
    def _collect_step(self, buffers: DeviceRollout, t, var_params,
                      policy_params, image_u8, extra, goal_sound,
                      current_sound, packed_host, key, use_sound):
        """One env transition. packed_host: (N, 4) f32 [fresh, done,
        bad_mask, env_reward] from the host. Writes index t (transition)
        and t+1 (boundary), acts at obs_{t+1}, returns (buffers,
        packed_out (N, A+1) = [action, raw_reward])."""
        fresh = packed_host[:, 0] > 0.5
        done = packed_host[:, 1]
        bad = packed_host[:, 2]
        env_reward = packed_host[:, 3]
        N = self.N

        image_feat, goal_feat = self._encode(
            var_params, image_u8, goal_sound, fresh, buffers.cached_goal,
            use_sound)
        D = self.config.representationDim
        raw_reward = jnp.sum(image_feat[:, :D] * goal_feat, axis=1) + env_reward
        if self.sound_sound:
            # current_sound encoded through the same sound branch
            # (the reference routes it through the negative slot,
            # vec_pretext_normalize.py:90-93)
            _, cur_feat = self.var_model.apply(
                {"params": var_params}, current_sound,
                method=self.var_model.encode_sound)
            raw_reward = raw_reward + self.sound_sound * jnp.sum(
                cur_feat * goal_feat, axis=1)

        # on-device return-RMS normalization (parallel moments over the N
        # running returns, matching ops/running_stats.py math)
        ret = buffers.ret * self.gamma + raw_reward
        b_mean = jnp.mean(ret)
        b_var = jnp.var(ret)
        delta = b_mean - buffers.rms_mean
        tot = buffers.rms_count + N
        new_mean = buffers.rms_mean + delta * N / tot
        m2 = (buffers.rms_var * buffers.rms_count + b_var * N
              + delta ** 2 * buffers.rms_count * N / tot)
        new_var = m2 / tot
        norm_reward = jnp.clip(
            raw_reward / jnp.sqrt(new_var + self.epsilon),
            -self.cliprew, self.cliprew)
        ret = jnp.where(done > 0.5, 0.0, ret)

        mask_next = (1.0 - done)
        # act at obs_{t+1}; hidden reset via mask inside the policy GRU
        value, action, logp, new_hx = self._embed_and_act(
            policy_params, image_u8, extra, goal_feat, image_feat,
            buffers.prev_hx, mask_next[:, None], key, self.deterministic)

        b = buffers._replace(
            obs_image=buffers.obs_image.at[t + 1].set(image_u8),
            obs_extra=buffers.obs_extra.at[t + 1].set(extra),
            obs_image_feat=buffers.obs_image_feat.at[t + 1].set(image_feat),
            obs_goal_feat=buffers.obs_goal_feat.at[t + 1].set(goal_feat),
            rnn_hx=buffers.rnn_hx.at[t + 1].set(buffers.prev_hx),
            actions=buffers.actions.at[t].set(buffers.prev_action),
            action_log_probs=buffers.action_log_probs.at[t].set(
                buffers.prev_log_prob),
            values=buffers.values.at[t].set(buffers.prev_value),
            rewards=buffers.rewards.at[t].set(norm_reward),
            masks=buffers.masks.at[t + 1].set(mask_next),
            bad_masks=buffers.bad_masks.at[t + 1].set(bad),
            cached_goal=goal_feat,
            prev_value=value, prev_log_prob=logp,
            prev_action=action, prev_hx=new_hx,
            ret=ret, rms_mean=new_mean, rms_var=new_var, rms_count=tot,
        )
        packed_out = jnp.concatenate(
            [action.astype(jnp.float32),
             raw_reward[:, None]], axis=1)
        return b, packed_out

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _init_step(self, buffers: DeviceRollout, var_params, policy_params,
                   image_u8, extra, goal_sound, fresh, key):
        """Reset boundary: store obs_0, act at obs_0."""
        image_feat, goal_feat = self._encode(
            var_params, image_u8, goal_sound, fresh, buffers.cached_goal, True)
        masks0 = jnp.ones((self.N, 1), jnp.float32)
        value, action, logp, new_hx = self._embed_and_act(
            policy_params, image_u8, extra, goal_feat, image_feat,
            jnp.zeros_like(buffers.prev_hx), masks0, key, self.deterministic)
        b = buffers._replace(
            obs_image=buffers.obs_image.at[0].set(image_u8),
            obs_extra=buffers.obs_extra.at[0].set(extra),
            obs_image_feat=buffers.obs_image_feat.at[0].set(image_feat),
            obs_goal_feat=buffers.obs_goal_feat.at[0].set(goal_feat),
            cached_goal=goal_feat,
            prev_value=value, prev_log_prob=logp, prev_action=action,
            prev_hx=new_hx,
        )
        return b, action

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _after_update(self, buffers: DeviceRollout):
        """Tail -> head copy (reference: storage.py after_update)."""
        return buffers._replace(
            obs_image=buffers.obs_image.at[0].set(buffers.obs_image[-1]),
            obs_extra=buffers.obs_extra.at[0].set(buffers.obs_extra[-1]),
            obs_image_feat=buffers.obs_image_feat.at[0].set(
                buffers.obs_image_feat[-1]),
            obs_goal_feat=buffers.obs_goal_feat.at[0].set(
                buffers.obs_goal_feat[-1]),
            rnn_hx=buffers.rnn_hx.at[0].set(buffers.rnn_hx[-1]),
            masks=buffers.masks.at[0].set(buffers.masks[-1]),
            bad_masks=buffers.bad_masks.at[0].set(buffers.bad_masks[-1]),
        )

    # -- host API -------------------------------------------------------------

    def init(self, raw_obs, key):
        goal = np.asarray(raw_obs["goal_sound"], np.float32)
        fresh = np.isfinite(goal.reshape(self.N, -1)[:, 0])
        self.buffers, action = self._init_step(
            self.buffers, self.var_params, self._policy_params,
            self._put_host(raw_obs["image"]),
            self._put_host(self._extra(raw_obs)),
            self._put_host(goal), self._put_host(fresh), key)
        return np.asarray(action)

    def step_async(self, t: int, raw_obs, env_reward, done, bad_masks, key):
        """Dispatch one fused step; returns a handle WITHOUT blocking on
        the device->host readback. The readback is started eagerly — via
        copy_to_host_async on co-located chips, or a background reader
        thread on the tunneled backend (the RPC releases the GIL) — so
        its latency overlaps any host work done before read_packed(): the
        basis of the pipelined rollout (one-step-stale action protocol in
        train/rl.py)."""
        goal = np.asarray(raw_obs["goal_sound"], np.float32)
        fresh = np.isfinite(goal.reshape(self.N, -1)[:, 0])
        use_sound = bool(fresh.any())
        packed_host = np.stack(
            [fresh.astype(np.float32), np.asarray(done, np.float32),
             np.asarray(bad_masks, np.float32).reshape(self.N),
             np.asarray(env_reward, np.float32)], axis=1)
        if self.sound_sound:
            cur = self._put_host(
                np.asarray(raw_obs["current_sound"], np.float32))
        else:
            cur = self._put_host(np.zeros((1,), np.float32), env_axis0=False)
        if use_sound:
            goal_dev = self._put_host(goal)
        else:
            # all rows cached: the compiled use_sound=False variant never
            # reads the goal sound — skip the (N,1,T,40) upload entirely
            goal_dev = self._put_host(np.zeros((1,), np.float32),
                                      env_axis0=False)
        self.buffers, packed_out = self._collect_step(
            self.buffers, jnp.asarray(t, jnp.int32), self.var_params,
            self._policy_params, self._put_host(raw_obs["image"]),
            self._put_host(self._extra(raw_obs)), goal_dev, cur,
            self._put_host(packed_host), key, use_sound)
        if self._async_copy:
            try:
                packed_out.copy_to_host_async()
            except AttributeError:  # pragma: no cover - older jax arrays
                pass
            return packed_out
        # tunneled backend: start the blocking readback on a worker thread
        # now, so the ~33 ms RPC runs while the host steps the simulators
        if self._reader is None:
            from concurrent.futures import ThreadPoolExecutor

            self._reader = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="d2h-reader")
        return self._reader.submit(np.asarray, packed_out)

    def read_packed(self, handle):
        """Block on one dispatched step: (action (host), raw_reward (host))."""
        if hasattr(handle, "result"):  # reader-thread future
            packed = handle.result()
        else:
            packed = np.asarray(handle)  # THE one readback per step
        action = packed[:, :-1]
        if self.buffers.actions.dtype == jnp.int32:
            action = action.astype(np.int32)
        return action, packed[:, -1]

    def step(self, t: int, raw_obs, env_reward, done, bad_masks, key):
        """Returns (action_next (host), raw_reward (host))."""
        return self.read_packed(
            self.step_async(t, raw_obs, env_reward, done, bad_masks, key))

    def _extra(self, raw_obs):
        v = np.asarray(raw_obs[self.extra_key])
        return v.astype(np.float32) if self.is_arm else v

    def set_policy_params(self, params):
        self._policy_params = params

    def cost_report(self, step_seconds):
        """XLA cost analysis of the fused per-step program
        (_collect_step): FLOPs, HBM bytes, and MFU at the measured step
        latency — the hardware grounding for the benched step p50
        (VERDICT r3 item 2)."""
        from var_tpu.utils.flops import program_report

        N, c = self.N, self.config
        # steady-state variant: cached goal (use_sound=False), no
        # sound-sound term — the program that runs on all mid-episode
        # steps and whose latency the fused-step p50 measures
        args = (
            self, self.buffers, jnp.asarray(0, jnp.int32),
            self.var_params, self._policy_params,
            jnp.zeros((N,) + tuple(c.img_dim), jnp.uint8),
            jnp.zeros_like(self.buffers.obs_extra[0]),
            jnp.zeros((1,), jnp.float32),
            jnp.zeros((1,), jnp.float32),
            jnp.zeros((N, 4), jnp.float32),
            jax.random.PRNGKey(0), False,
        )
        return program_report(type(self)._collect_step, args,
                              step_seconds, items_per_call=N)

    def device_batch(self) -> Dict[str, Any]:
        """Rollout view for PPO.update — everything already on device."""
        b = self.buffers
        return {
            "obs": {
                "image": b.obs_image[:-1],
                self.extra_key: b.obs_extra[:-1],
                "image_feat": b.obs_image_feat[:-1],
                "goal_sound_feat": b.obs_goal_feat[:-1],
            },
            "rnn_hx0": b.rnn_hx[0],
            "actions": b.actions,
            "value_preds": b.values,
            "returns": self._returns,
            "masks": b.masks[:-1],
            "old_log_probs": b.action_log_probs,
        }

    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def _returns_fn(self, buffers, gamma, gae_lambda, use_gae, proper):
        value_preds = jnp.concatenate(
            [buffers.values, buffers.prev_value[None]], axis=0)  # (T+1, N)
        returns, _ = compute_returns(
            buffers.rewards, value_preds, buffers.masks, buffers.bad_masks,
            buffers.prev_value, gamma, gae_lambda, use_gae, proper)
        return returns

    def compute_returns(self, use_gae, gamma, gae_lambda, proper):
        self._returns = self._returns_fn(
            self.buffers, gamma, gae_lambda, bool(use_gae), bool(proper))

    def after_update(self):
        self.buffers = self._after_update(self.buffers)

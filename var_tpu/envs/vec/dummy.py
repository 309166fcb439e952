"""In-process sequential vec env (reference: Envs/vec_env/dummy_vec_env.py).

Keeps per-env raw obs dicts in `obs_list` for the triplet collector
(reference: pretext.py:49,71 reads envs.unwrapped.obs_list), auto-resets
on done like the shmem worker does.
"""
from __future__ import annotations

import numpy as np

from .base import VecEnv, stack_obs


class DummyVecEnv(VecEnv):
    def __init__(self, env_fns, audio=None):
        self.envs = [fn() for fn in env_fns]
        env = self.envs[0]
        super().__init__(len(env_fns), env.observation_space, env.action_space)
        if audio is not None:
            # inject the shared audio store (reference injects the
            # module-level audioLoader — dummy_vec_env.py:6-18)
            for e in self.envs:
                e.unwrapped.audio = audio
        self.actions = None
        self.obs_list = [None] * self.num_envs

    def reset(self):
        self.obs_list = [env.reset() for env in self.envs]
        return stack_obs(self.obs_list, self.observation_space)

    def step_async(self, actions):
        self.actions = actions

    def step_wait(self):
        obs, rews, dones, infos = [], [], [], []
        for i, env in enumerate(self.envs):
            o, r, d, info = env.step(self.actions[i])
            if d:
                o = env.reset()
            obs.append(o)
            rews.append(r)
            dones.append(d)
            infos.append(info)
        self.obs_list = obs
        return (
            stack_obs(obs, self.observation_space),
            np.asarray(rews, dtype=np.float32),
            np.asarray(dones, dtype=bool),
            tuple(infos),
        )

    def get_images(self):
        """One rgb_array frame per env; the base render() tiles them
        (reference: dummy_vec_env.py get_images)."""
        return [env.render("rgb_array") for env in self.envs]

    def close_extras(self):
        for env in self.envs:
            env.close()

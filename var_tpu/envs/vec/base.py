"""Vectorized-environment protocol.

Rebuild of the reference's VecEnv abstraction
(reference: Envs/vec_env/vec_env.py:31-190): batched reset / step_async /
step_wait over N environments with dict observations, wrapper delegation
via __getattr__ passthrough.
"""
from __future__ import annotations

import contextlib
import os

from abc import ABC, abstractmethod
from collections import OrderedDict

import numpy as np


class VecEnv(ABC):
    closed = False

    def __init__(self, num_envs, observation_space, action_space):
        self.num_envs = num_envs
        self.observation_space = observation_space
        self.action_space = action_space

    @abstractmethod
    def reset(self):
        ...

    @abstractmethod
    def step_async(self, actions):
        ...

    @abstractmethod
    def step_wait(self):
        ...

    def close_extras(self):
        pass

    def close(self):
        if self.closed:
            return
        self.close_extras()
        self.closed = True

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()

    def get_images(self):
        """One RGB frame per environment (reference: vec_env.py:123-127)."""
        raise NotImplementedError

    def render(self, mode="human"):
        """Tile every env's frame into one roughly-square composite
        (reference: vec_env.py:112-121 → get_images → tile_images). The
        reference's 'human' branch pushed the composite to an OpenCV
        viewer; headless-first here, both modes return the array and the
        caller decides how to display it."""
        from .wrappers import tile_images

        try:
            imgs = [im for im in self.get_images() if im is not None]
        except NotImplementedError:
            return None
        if not imgs:
            return None
        return tile_images(imgs)

    @property
    def unwrapped(self):
        return self


class VecEnvWrapper(VecEnv):
    """Delegating wrapper (reference: vec_env.py:140-190)."""

    def __init__(self, venv, observation_space=None, action_space=None):
        self.venv = venv
        super().__init__(
            num_envs=venv.num_envs,
            observation_space=observation_space or venv.observation_space,
            action_space=action_space or venv.action_space,
        )

    def step_async(self, actions):
        self.venv.step_async(actions)

    @abstractmethod
    def reset(self):
        ...

    @abstractmethod
    def step_wait(self):
        ...

    def close(self):
        return self.venv.close()

    def render(self, mode="human"):
        return self.venv.render(mode)

    def get_images(self):
        return self.venv.get_images()

    @property
    def unwrapped(self):
        return self.venv.unwrapped

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self.venv, name)


@contextlib.contextmanager
def clear_mpi_env_vars():
    """Temporarily strip OMPI_/PMI_ env vars while spawning worker
    processes, so a child importing mpi4py does not MPI_Init itself as a
    fake rank and hang (reference: Envs/vec_env/vec_env.py:209-225)."""
    removed = {}
    for k in list(os.environ):
        if k.startswith(("OMPI_", "PMI_")):
            removed[k] = os.environ.pop(k)
    try:
        yield
    finally:
        os.environ.update(removed)


def stack_obs(obs_list, observation_space) -> "OrderedDict[str, np.ndarray]":
    """Stack a list of dict observations into batched arrays with the
    space's dtypes."""
    out = OrderedDict()
    for key, space in observation_space.items():
        out[key] = np.stack(
            [np.asarray(o[key]).reshape(space.shape) for o in obs_list]
        ).astype(space.dtype)
    return out


class VecEnvObservationWrapper(VecEnvWrapper):
    """Wrapper that transforms only observations via `process()`
    (reference: vec_env.py:155-190). Subclasses override process();
    reset/step_wait route every obs batch through it."""

    def process(self, obs):
        raise NotImplementedError

    def reset(self):
        return self.process(self.venv.reset())

    def step_wait(self):
        obs, rews, news, infos = self.venv.step_wait()
        return self.process(obs), rews, news, infos

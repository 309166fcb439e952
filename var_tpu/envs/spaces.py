"""Minimal observation/action space types (gym is not a dependency).

Mirrors the subset of gym.spaces the reference uses: Box, Discrete, Dict
(reference: Envs/pybullet/arms/tasks/fourInARow/fourInARow.py:36-56,
Envs/ai2thor/RL_env_VAR.py:42-60). Spaces are plain data: shape/dtype
descriptors plus bounded sampling for tests.
"""
from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np


class Space:
    """Base descriptor of an observation/action element."""

    shape: Tuple[int, ...]
    dtype: np.dtype

    def sample(self, rng: np.random.RandomState):
        raise NotImplementedError

    def contains(self, x) -> bool:
        raise NotImplementedError


@dataclass
class Box(Space):
    low: np.ndarray
    high: np.ndarray
    shape: Tuple[int, ...] = None
    dtype: np.dtype = np.float32

    def __post_init__(self):
        self.low = np.asarray(self.low, dtype=self.dtype)
        self.high = np.asarray(self.high, dtype=self.dtype)
        if self.shape is None:
            self.shape = np.broadcast(self.low, self.high).shape
        else:
            self.shape = tuple(self.shape)
            self.low = np.broadcast_to(self.low, self.shape).astype(self.dtype)
            self.high = np.broadcast_to(self.high, self.shape).astype(self.dtype)

    def sample(self, rng: np.random.RandomState):
        low = np.where(np.isfinite(self.low), self.low, -1.0)
        high = np.where(np.isfinite(self.high), self.high, 1.0)
        if np.issubdtype(self.dtype, np.integer):
            # uniform over integers incl. both endpoints (rounding a
            # continuous draw would halve the endpoint probabilities)
            return rng.randint(low.astype(np.int64),
                               high.astype(np.int64) + 1,
                               size=self.shape).astype(self.dtype)
        x = rng.uniform(low=low, high=high, size=self.shape)
        return x.astype(self.dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        if x.shape != self.shape:
            return False
        lo_ok = np.all(np.isneginf(self.low) | (x >= self.low))
        hi_ok = np.all(np.isposinf(self.high) | (x <= self.high))
        return bool(lo_ok and hi_ok)

    def __repr__(self):
        return f"Box(shape={self.shape}, dtype={np.dtype(self.dtype).name})"

    def __hash__(self):
        # spaces are immutable descriptors in practice; hashability lets
        # them ride inside flax Modules used as jit static arguments
        # (models/policy.py act/get_value)
        return hash((self.shape, np.dtype(self.dtype).str,
                     self.low.tobytes(), self.high.tobytes()))


@dataclass
class Discrete(Space):
    n: int
    shape: Tuple[int, ...] = field(default=(), init=False)
    dtype: np.dtype = field(default=np.int64, init=False)

    def sample(self, rng: np.random.RandomState):
        return np.int64(rng.randint(self.n))

    def contains(self, x) -> bool:
        try:
            x = np.asarray(x)
            if x.size != 1:
                return False
            return 0 <= int(x.reshape(())) < self.n
        except (TypeError, ValueError):
            return False

    def __repr__(self):
        return f"Discrete({self.n})"

    def __hash__(self):
        return hash(("Discrete", self.n))


@dataclass
class MultiBinary(Space):
    """n independent {0,1} flags (gym.spaces.MultiBinary — the reference's
    Policy dispatches a Bernoulli head for it, models/ppo/model.py:39-41)."""

    n: int
    shape: Tuple[int, ...] = field(default=None, init=False)
    dtype: np.dtype = field(default=np.int8, init=False)

    def __post_init__(self):
        self.shape = (self.n,)

    def sample(self, rng: np.random.RandomState):
        return rng.randint(0, 2, size=(self.n,)).astype(self.dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return x.shape == (self.n,) and bool(np.isin(x, (0, 1)).all())

    def __repr__(self):
        return f"MultiBinary({self.n})"

    def __hash__(self):
        return hash(("MultiBinary", self.n))


class DictSpace(Space):
    """Ordered dict of named sub-spaces (mirrors gym.spaces.Dict)."""

    def __init__(self, spaces):
        if isinstance(spaces, dict) and not isinstance(spaces, OrderedDict):
            spaces = OrderedDict(sorted(spaces.items()))
        self.spaces = OrderedDict(spaces)

    def sample(self, rng: np.random.RandomState):
        return OrderedDict((k, s.sample(rng)) for k, s in self.spaces.items())

    def contains(self, x) -> bool:
        if not isinstance(x, dict):
            return False
        return all(k in x and s.contains(x[k]) for k, s in self.spaces.items())

    def keys(self):
        return self.spaces.keys()

    def items(self):
        return self.spaces.items()

    def __getitem__(self, key):
        return self.spaces[key]

    def __iter__(self):
        return iter(self.spaces)

    def __contains__(self, key):
        return key in self.spaces

    def __repr__(self):
        inner = ", ".join(f"{k}: {v!r}" for k, v in self.spaces.items())
        return f"DictSpace({inner})"

    def __hash__(self):
        return hash(tuple((k, hash(v)) for k, v in self.spaces.items()))

    def __eq__(self, other):
        return (isinstance(other, DictSpace)
                and list(self.spaces.keys()) == list(other.spaces.keys())
                and all(hash(a) == hash(b) for a, b in
                        zip(self.spaces.values(), other.spaces.values())))


def zeros_like_space(space: Space, batch: Optional[int] = None):
    """Allocate a zero-filled numpy array (or dict of arrays) shaped like `space`."""
    if isinstance(space, DictSpace):
        return OrderedDict(
            (k, zeros_like_space(s, batch)) for k, s in space.spaces.items()
        )
    shape = space.shape if batch is None else (batch,) + tuple(space.shape)
    return np.zeros(shape, dtype=space.dtype)

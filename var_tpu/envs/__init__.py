"""Environment layer: spaces, registry, built-in simulators, adapters."""
from __future__ import annotations

from . import spaces  # noqa: F401
from .core import Env, TimeLimitMask, make, register, registered_ids  # noqa: F401


def make_entry_points(config, env: str):
    """Resolve (pretext_entry, rl_entry) constructors for gym_register.

    simBackend selects the built-in numpy simulator or the gated external
    adapter (PyBullet / AI2-THOR), both exposing identical obs schemas.
    """
    backend = getattr(config, "simBackend", "builtin")
    if env == "arms":
        if backend == "pybullet":
            from .adapters.pybullet_arm import (
                PyBulletFourInARow, PyBulletFourInARowPretext,
            )

            return PyBulletFourInARowPretext, PyBulletFourInARow
        from .arm_sim import FourInARowPretextSim, FourInARowSim

        return FourInARowPretextSim, FourInARowSim
    if env == "ai2thor":
        if backend == "ithor":
            from .adapters.ithor import ITHOREnv, ITHORPretextEnv

            return ITHORPretextEnv, ITHOREnv
        from .grid_sim import GridHousePretextSim, GridHouseSim

        return GridHousePretextSim, GridHouseSim
    raise NotImplementedError(env)

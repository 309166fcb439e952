"""Config selection and env registration.

Mirrors the reference cfg.py surface (reference: cfg.py:5-73): module-level
ENV/TASK selectors, main_config() building the active profile, and
gym_register() wiring env ids to entry points — here into our own registry
(var_tpu.envs.core) instead of the gym global registry.

ENV/TASK may also be set via the VAR_TPU_ENV / VAR_TPU_TASK environment
variables so drivers can be switched without editing source (the reference
requires editing cfg.py:5-6).
"""
import os

from .base import ConfigBase, printColor
from .arm import ArmConfig, KukaEnvConfig
from .ai2thor import AI2ThorConfig, AI2ThorEnvConfig

ENV = os.environ.get("VAR_TPU_ENV", "ai2thor")  # 'ai2thor' | 'arms'
TASK = os.environ.get("VAR_TPU_TASK", "fourInARow")  # for 'arms' only


def main_config(env: str = None, task: str = None):
    """Build the active config profile (reference: cfg.py:19-44)."""
    env = ENV if env is None else env
    task = TASK if task is None else task

    if env == "ai2thor":
        config = AI2ThorConfig()
        config.get_env_config(AI2ThorEnvConfig)
    elif env == "arms":
        if task not in ("fourInARow",):
            raise NotImplementedError(f"Unknown arms task {task!r}")
        config = ArmConfig()
        config.get_env_config(KukaEnvConfig)
    else:
        raise NotImplementedError(f"Unknown ENV {env!r}")
    return config


def gym_register(config, env: str = None):
    """Register pretext/RL env ids for the active profile
    (reference: cfg.py:46-73). Entry points resolve to the built-in numpy
    simulators or to the gated external-simulator adapters depending on
    config.simBackend."""
    from var_tpu.envs import make_entry_points
    from var_tpu.envs.core import register

    if env is None:
        # derive from the profile itself so --env overrides propagate
        env = "arms" if config.name == "ArmConfig" else "ai2thor"
    pretext_ep, rl_ep = make_entry_points(config, env)
    register(f"{env}-pretext-v2", pretext_ep, config=config)
    register(f"{env}-RL-v2", rl_ep, config=config)


__all__ = [
    "ConfigBase", "printColor", "ArmConfig", "KukaEnvConfig",
    "AI2ThorConfig", "AI2ThorEnvConfig", "main_config", "gym_register",
    "ENV", "TASK",
]

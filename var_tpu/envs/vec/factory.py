"""Vec-env factory (reference: Envs/vec_env/envs.py:10-64 make_vec_envs)."""
from __future__ import annotations

from typing import Optional

from var_tpu.data.audio_store import AudioStore
from var_tpu.envs.core import TimeLimitMask, make
from var_tpu.envs.vec.dummy import DummyVecEnv
from var_tpu.envs.vec.shmem import ShmemVecEnv


def make_env_thunk(env_id: str, seed: int, rank: int):
    """(reference: envs.py:10-22) — per-rank seeding + time-limit masking.

    The env id is resolved to its (entry_point, kwargs) HERE, in the
    parent, because the registry is process-local: spawn/forkserver
    workers unpickle the thunk into a fresh interpreter whose registry is
    empty. The thunk therefore closes over the constructor itself
    (cloudpickle ships it), never over the id."""
    from var_tpu.envs.core import resolve

    entry_point, default_kwargs = resolve(env_id)

    def _thunk():
        env = entry_point(**default_kwargs)
        env.seed(seed + rank)
        return TimeLimitMask(env)

    return _thunk


def make_vec_envs(
    env_name: str,
    seed: int,
    num_processes: int,
    gamma,
    randomCollect: bool,
    config,
    pretext_model=None,
    pretext_params=None,
    audio: Optional[AudioStore] = None,
):
    """Build the vectorized env stack. Mirrors the reference factory:
    >1 process -> shared-memory workers, else in-process; the VAR reward
    wrapper attaches unless this is the random-collection phase."""
    thunks = [make_env_thunk(env_name, seed, i) for i in range(num_processes)]

    if audio is None:
        audio = AudioStore(config)
        audio.loadData()

    backend = getattr(config, "vecEnvBackend", "auto")
    use_shmem = (
        backend == "shmem" or (backend == "auto" and num_processes > 1)
    )
    if use_shmem:
        envs = ShmemVecEnv(
            thunks, context=getattr(config, "vecEnvContext", "forkserver"),
            audio=audio)
    else:
        envs = DummyVecEnv(thunks, audio=audio)

    if not randomCollect:
        from var_tpu.rl.reward import VecVARReward

        if pretext_model is None or pretext_params is None:
            raise ValueError(
                "make_vec_envs(randomCollect=False) needs the frozen VAR "
                "(pretext_model, pretext_params)"
            )
        if gamma is None:
            envs = VecVARReward(envs, pretext_model, pretext_params, config,
                                ob=False, ret=False)
        else:
            envs = VecVARReward(envs, pretext_model, pretext_params, config,
                                ob=False, ret=True, gamma=gamma)
    return envs

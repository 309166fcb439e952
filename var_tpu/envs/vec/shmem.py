"""Multi-process shared-memory vec env.

Rebuild of the reference's ShmemVecEnv (reference:
Envs/vec_env/shmem_vec_env.py:24-154): one worker process per environment
(fork context), one shared-memory block per (env, obs key), command pipes
carrying ('reset'|'step'|'render'|'close'), lockstep send-then-recv
stepping, auto-reset on done inside the worker, and a per-env `obs_list`
of raw dict observations for the triplet collector.

The shared blocks are either multiprocessing.Array (ctypes, the
reference's mechanism) or — when the optional C++ transport is built
(native/shmbuf.cpp) — POSIX shared memory mapped via the var_tpu.native
module for lower-overhead bulk copies. The worker protocol is identical
either way.
"""
from __future__ import annotations

import ctypes
import multiprocessing as mp
from collections import OrderedDict

import numpy as np

from .base import VecEnv

_NP_TO_CT = {
    np.dtype(np.float32): ctypes.c_float,
    np.dtype(np.float64): ctypes.c_double,
    np.dtype(np.int32): ctypes.c_int32,
    np.dtype(np.int64): ctypes.c_int64,
    np.dtype(np.uint8): ctypes.c_uint8,
    np.dtype(bool): ctypes.c_bool,
}


class CloudpickleWrapper:
    """Pickle env thunks with cloudpickle (reference: vec_env.py:192-207)."""

    def __init__(self, x):
        self.x = x

    def __getstate__(self):
        import cloudpickle

        return cloudpickle.dumps(self.x)

    def __setstate__(self, ob):
        import pickle

        self.x = pickle.loads(ob)


class ShmemVecEnv(VecEnv):
    def __init__(self, env_fns, context="forkserver", audio=None,
                 transport="auto"):
        # default is forkserver, NOT the reference's fork: the learner
        # process has a multithreaded JAX runtime by the time envs are
        # built, and forking a multithreaded parent risks deadlocks (JAX
        # warns about exactly this). Workers only need numpy + the env +
        # AudioStore, all of which pickle; forkserver gives them a clean
        # single-threaded parent. 'fork' remains available for callers.
        ctx = mp.get_context(context)
        if context == "forkserver":
            # pay the worker import chain once, in the forkserver server
            ctx.set_forkserver_preload(["var_tpu.envs.vec.worker_preload"])
        # probe one env for spaces (the reference builds a dummy env the
        # same way — shmem_vec_env.py:33-37)
        probe = env_fns[0]()
        observation_space, action_space = probe.observation_space, probe.action_space
        probe.close()
        del probe
        super().__init__(len(env_fns), observation_space, action_space)

        self.obs_keys, self.obs_shapes, self.obs_dtypes = [], {}, {}
        for key, space in observation_space.items():
            self.obs_keys.append(key)
            self.obs_shapes[key] = space.shape
            self.obs_dtypes[key] = np.dtype(space.dtype)

        # obs transport: one contiguous POSIX segment (C++ shmbuf, batched
        # per-key regions, one parent copy per key) when the native lib
        # builds; per-(env,key) mp.Array blocks (the reference's exact
        # mechanism) otherwise or on transport="array".
        self.segment = None
        if transport in ("auto", "posix"):
            from var_tpu.envs.vec import shm_transport

            if shm_transport.available():
                self.segment = shm_transport.ShmObsSegment(
                    self.obs_keys, self.obs_shapes, self.obs_dtypes,
                    len(env_fns))
            elif transport == "posix":
                raise RuntimeError("posix transport requested but the "
                                   "shmbuf native library is unavailable")

        if self.segment is None:
            self.obs_bufs = [
                {
                    k: ctx.Array(
                        _NP_TO_CT[self.obs_dtypes[k]],
                        int(np.prod(self.obs_shapes[k])),
                        lock=False,
                    )
                    for k in self.obs_keys
                }
                for _ in env_fns
            ]
        else:
            self.obs_bufs = [self.segment.worker_handle()
                             for _ in env_fns]  # picklable per-worker handle
        self.parent_pipes, self.procs = [], []
        for i, (env_fn, obs_buf) in enumerate(zip(env_fns, self.obs_bufs)):
            parent_pipe, child_pipe = ctx.Pipe()
            proc = ctx.Process(
                target=_subproc_worker,
                args=(
                    child_pipe, parent_pipe, CloudpickleWrapper(env_fn),
                    obs_buf, self.obs_shapes, self.obs_dtypes, self.obs_keys,
                    CloudpickleWrapper(audio), i,
                ),
                daemon=True,
            )
            from .base import clear_mpi_env_vars

            with clear_mpi_env_vars():  # reference: shmem worker spawn
                proc.start()
            self.procs.append(proc)
            self.parent_pipes.append(parent_pipe)
            child_pipe.close()
        self.waiting_step = False
        self.obs_list = [None] * self.num_envs

    def reset(self):
        if self.waiting_step:
            self.step_wait()
        for pipe in self.parent_pipes:
            pipe.send(("reset", None))
        for i, pipe in enumerate(self.parent_pipes):
            self._recv_checked(pipe, i)
        return self._decode_obses()

    def step_async(self, actions):
        assert len(actions) == self.num_envs
        for pipe, act in zip(self.parent_pipes, actions):
            pipe.send(("step", act))
        self.waiting_step = True

    def _recv_checked(self, pipe, idx, timeout: float = 300.0):
        """recv with worker-death detection. The reference parent blocks
        forever if a worker dies (SURVEY.md §5.3); here a dead process or a
        timeout raises a diagnosable error instead."""
        while not pipe.poll(1.0):
            proc = self.procs[idx]
            if not proc.is_alive():
                raise RuntimeError(
                    f"ShmemVecEnv worker {idx} died "
                    f"(exitcode {proc.exitcode})")
            timeout -= 1.0
            if timeout <= 0:
                raise TimeoutError(
                    f"ShmemVecEnv worker {idx} unresponsive")
        return pipe.recv()

    def step_wait(self):
        outs = [self._recv_checked(pipe, i)
                for i, pipe in enumerate(self.parent_pipes)]
        self.waiting_step = False
        _, rews, dones, infos = zip(*outs)
        obs = self._decode_obses()
        return (
            obs,
            np.asarray(rews, dtype=np.float32),
            np.asarray(dones, dtype=bool),
            tuple(infos),
        )

    def get_images(self):
        """Broadcast a render request to EVERY worker and collect the
        frames in env order (reference: shmem_vec_env.py:97-100); the base
        render() composes them with tile_images."""
        for pipe in self.parent_pipes:
            pipe.send(("render", "rgb_array"))
        return [self._recv_checked(pipe, i)
                for i, pipe in enumerate(self.parent_pipes)]

    def close_extras(self):
        if self.waiting_step:
            self.step_wait()
        for pipe in self.parent_pipes:
            pipe.send(("close", None))
        for pipe in self.parent_pipes:
            pipe.recv()
            pipe.close()
        for proc in self.procs:
            proc.join()
        if self.segment is not None:
            self.segment.close()

    def _decode_obses(self):
        """Rebuild batched arrays + per-env obs_list from the shared blocks
        (reference: shmem_vec_env.py:105-115 keeps both forms)."""
        result = OrderedDict()
        self.obs_list = [dict() for _ in range(self.num_envs)]
        if self.segment is not None:
            # posix transport: the segment IS the batched array — one copy
            # per key total (vs one per env per key below)
            for k in self.obs_keys:
                batched = self.segment.batched(k).copy()
                result[k] = batched
                for i in range(self.num_envs):
                    self.obs_list[i][k] = batched[i]
            return result
        for k in self.obs_keys:
            bufs = [b[k] for b in self.obs_bufs]
            per_env = [
                np.frombuffer(b, dtype=self.obs_dtypes[k]).reshape(
                    self.obs_shapes[k])
                for b in bufs
            ]
            for i, arr in enumerate(per_env):
                self.obs_list[i][k] = arr.copy()
            result[k] = np.stack(per_env)
        return result


def _subproc_worker(pipe, parent_pipe, env_fn_wrapper, obs_buf, obs_shapes,
                    obs_dtypes, keys, audio_wrapper, env_idx=0):
    """(reference: shmem_vec_env.py:117-154)."""
    from var_tpu.envs.vec.shm_transport import ShmObsWorker

    if isinstance(obs_buf, ShmObsWorker):
        views = obs_buf.open(env_idx)  # row slices of the posix segment

        def _write_obs(obs):
            for k in keys:
                np.copyto(views[k],
                          np.asarray(obs[k]).reshape(obs_shapes[k]))
    else:
        def _write_obs(obs):
            for k in keys:
                dst = np.frombuffer(obs_buf[k], dtype=obs_dtypes[k]).reshape(
                    obs_shapes[k])
                np.copyto(dst, np.asarray(obs[k]).reshape(obs_shapes[k]))

    parent_pipe.close()
    env = env_fn_wrapper.x()
    audio = audio_wrapper.x
    if audio is not None:
        env.unwrapped.audio = audio
        audio.loadData()
    try:
        while True:
            cmd, data = pipe.recv()
            if cmd == "reset":
                _write_obs(env.reset())
                pipe.send(("ok",))
            elif cmd == "step":
                obs, reward, done, info = env.step(data)
                if done:
                    obs = env.reset()
                _write_obs(obs)
                pipe.send((None, reward, done, info))
            elif cmd == "render":
                pipe.send(env.render(mode=data))
            elif cmd == "close":
                pipe.send(None)
                break
            else:
                raise RuntimeError(f"Got unrecognized cmd {cmd}")
    except KeyboardInterrupt:
        print("ShmemVecEnv worker: got KeyboardInterrupt")
    finally:
        env.close()

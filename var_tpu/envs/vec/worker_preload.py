"""Forkserver preload module for ShmemVecEnv workers.

Imported once by the multiprocessing forkserver SERVER process; every
worker then forks from the server and inherits these imports for free
instead of paying the full numpy/jax/var_tpu import chain per worker
(~10 s each on a small host). The server never initializes a JAX backend
(imports only), so forking from it is safe — the multithreaded-runtime
fork hazard applies to initialized runtimes, which is exactly why the
learner parent uses forkserver instead of fork in the first place.
"""
# The env + audio modules cover everything a worker touches.
import cloudpickle  # noqa: F401
import numpy  # noqa: F401

import var_tpu.data.audio_store  # noqa: F401
import var_tpu.envs.arm_sim  # noqa: F401
import var_tpu.envs.core  # noqa: F401
import var_tpu.envs.grid_sim  # noqa: F401

"""Persistent XLA compilation cache.

The fused rollout/eval/pretext programs compile in seconds on co-located
chips but take minutes through a remote-compile tunnel; caching the
compiled executables on disk makes every run after the first start in
seconds. Safe to call unconditionally: the cache key includes platform,
topology and compiler flags, so CPU test runs and TPU runs never collide.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "var_tpu", "jit")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a disk directory and lower the
    entry thresholds so the handful of large fused programs all qualify.
    Returns the cache directory. Set VAR_TPU_JIT_CACHE=0 to disable."""
    env = os.environ.get("VAR_TPU_JIT_CACHE")
    if env == "0":
        return ""
    path = path or env or _DEFAULT
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    return path

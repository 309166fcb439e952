"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a faked host mesh
(xla_force_host_platform_device_count) so tests never need TPU hardware.
The container's sitecustomize imports jax at interpreter startup (so env
vars alone are too late), but backend *resolution* is lazy — switching the
platform via jax.config before the first computation works.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # Tests compile for correctness, not speed: skipping the expensive
    # LLVM optimization passes cuts CPU compile time ~5-20x (measured:
    # policy-grad compile 55 s -> 3 s on a 1-core box) without touching
    # numerics (no fast-math involved).
    + " --xla_backend_optimization_level=0"
    + " --xla_llvm_disable_expensive_passes=true"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

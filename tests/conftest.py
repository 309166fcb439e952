"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a faked host mesh
(xla_force_host_platform_device_count) so tests never need TPU hardware.
The container's sitecustomize imports jax at interpreter startup (so env
vars alone are too late), but backend *resolution* is lazy — switching the
platform via jax.config before the first computation works.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

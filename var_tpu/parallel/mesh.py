"""Device mesh construction and sharding helpers.

The reference has no gradient-parallel backend at all (SURVEY.md §2.10: its
only parallelism is N simulator processes feeding one learner device). The
TPU-native equivalent: a jax.sharding.Mesh over the chip set with the batch
axis sharded ('dp'); XLA inserts the gradient all-reduces over ICI. Both
training phases (pretext triplets, PPO minibatches) shard the same way —
batch-parallel SPMD via jit + NamedSharding, no pmap, no hand-written
collectives.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     coordinator_bind_address: Optional[str] = None):
    """Multi-host initialization (DCN between hosts, ICI within).

    The reference has no multi-host story at all; here a multi-host launch
    is `jax.distributed.initialize` + the same mesh/sharding code — the
    global device list then spans hosts and batch shards ride DCN only at
    the host boundary. No-op when launched single-host (TPU pods set the
    coordinator via environment variables automatically).

    Two-host launch recipe (call before any jax computation):

        # host 0 (also runs the coordinator)
        init_distributed("host0:8476", num_processes=2, process_id=0)
        # host 1
        init_distributed("host0:8476", num_processes=2, process_id=1)

    then build_mesh() sees the global device list; batch shards cross the
    host boundary over DCN, within-host over ICI. Validated without
    hardware two ways (tests/test_sharding.py): the loopback form
    (num_processes=1) runs the full coordination-service handshake, and
    test_two_process_spmd_grad runs a REAL 2-process global mesh whose
    gradient all-reduce crosses the process boundary (CPU backends need
    jax.config jax_cpu_collectives_implementation='gloo' for that;
    TPU pods use their native ICI/DCN collectives)."""
    import jax

    if num_processes is None and coordinator_address is None:
        return  # single-host
    if coordinator_bind_address is None and coordinator_address is not None:
        # jax's default derivation binds the wildcard IPv6 interface,
        # which fails silently on IPv6-less hosts (the workers then spin
        # on 'Connection refused'); bind the advertised address instead.
        coordinator_bind_address = coordinator_address
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        coordinator_bind_address=coordinator_bind_address,
    )


def build_mesh(mesh_shape: Optional[Dict[str, int]] = None,
               devices=None) -> Mesh:
    """Build a Mesh from {'dp': n, ...}. Default: all devices on one 'dp'
    axis. Axis sizes must multiply to the device count used."""
    devices = jax.devices() if devices is None else devices
    if not mesh_shape:
        mesh_shape = {"dp": len(devices)}
    names = tuple(mesh_shape.keys())
    sizes = tuple(int(mesh_shape[n]) for n in names)
    n_used = int(np.prod(sizes))
    if n_used > len(devices):
        raise ValueError(
            f"mesh {mesh_shape} needs {n_used} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n_used]).reshape(sizes)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """device_put a pytree of host arrays with leading-axis sharding."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_to_multiple(batch: np.ndarray, multiple: int, axis: int = 0):
    """Pad a host batch so its size divides the dp axis; returns
    (padded, true_size). Needed because XLA requires even shards."""
    n = batch.shape[axis]
    rem = n % multiple
    if rem == 0:
        return batch, n
    pad = multiple - rem
    widths = [(0, 0)] * batch.ndim
    widths[axis] = (0, pad)
    return np.pad(batch, widths, mode="edge"), n

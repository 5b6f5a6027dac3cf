"""Device mesh + sharding helpers.

The reference has no distributed machinery (SURVEY.md section 2.2); here
the batch-of-environments and data-parallel training shard over a
jax.sharding.Mesh, with XLA inserting ICI collectives. Multi-host (DCN)
extends the same mesh via jax.distributed.initialize.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ('data',)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # fold extra axes as 1 except the first
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data', rest replicated."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree with its leading axis sharded over the mesh."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host (DCN) initialization path.

    Calls jax.distributed.initialize when multi-process coordinates are
    available — explicitly, via JAX_COORDINATOR_ADDRESS-style env vars, or
    from a cluster environment jax can auto-detect (TPU pods). Returns
    True when a multi-process runtime was initialized, False for the
    single-host no-op. After init, jax.devices() is global, so make_mesh
    spans all hosts and the same shard_map rollouts/DP train steps ride
    DCN across slices with no further changes.
    """
    import os
    explicit = coordinator_address is not None
    env_configured = 'JAX_COORDINATOR_ADDRESS' in os.environ or \
        'COORDINATOR_ADDRESS' in os.environ
    # TPU_WORKER_HOSTNAMES is also set by libtpu on single-host cloud
    # TPU VMs — only treat it as "on a pod" with >1 worker listed
    workers = os.environ.get('TPU_WORKER_HOSTNAMES', '')
    on_pod = len([w for w in workers.split(',') if w.strip()]) > 1 or \
        'MEGASCALE_COORDINATOR_ADDRESS' in os.environ
    if not (explicit or env_configured or on_pod):
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)
    return True

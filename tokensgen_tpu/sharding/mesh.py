"""Device-mesh setup and sharding helpers.

The reference scales two ways (SURVEY §2.3): accelerate/NCCL data-parallel training
and a torch.multiprocessing model-replica fan-out of FIFO queue windows. Here both
collapse into one SPMD program over a `jax.sharding.Mesh`:

* axis ``data``  — data parallelism for training (grad `psum` over ICI) and batch
  sharding at inference,
* axis ``queue`` — the FIFO lookahead-rank axis: the 2·num_partitions=8 queue
  windows of one FIFO iteration are laid out on devices and merged with ICI
  collectives instead of the reference's CPU tensor queues
  (`cogvideo_sampling_mp_fifo.py:194-334`).

No NCCL/MPI equivalents: XLA inserts all collectives from sharding annotations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    queue: int = 1
    model: int = 1  # tensor parallelism: attention heads / FFN sharding

    @property
    def num_devices(self) -> int:
        return self.data * self.queue * self.model


def make_mesh(spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data=len(devices))
    if spec.num_devices > len(devices):
        raise ValueError(f"mesh {spec} needs {spec.num_devices} devices, have {len(devices)}")
    devs = np.asarray(devices[: spec.num_devices]).reshape(
        spec.data, spec.queue, spec.model
    )
    return Mesh(devs, axis_names=("data", "queue", "model"))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host wiring (SURVEY §2.3/§7.2-8): `jax.distributed.initialize`.

    Call BEFORE any other jax use. Arguments fall back to the standard
    environment (`JAX_COORDINATOR_ADDRESS` / `JAX_NUM_PROCESSES` /
    `JAX_PROCESS_ID`, or cloud-TPU auto-detection when all are None). Returns
    True when running multi-process. Single-process callers may simply never
    call this.
    """
    if coordinator_address or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()  # env vars / cloud-TPU auto-detection
    return jax.process_count() > 1


def process_batch_shard(global_batch_size: int) -> tuple:
    """(local_batch_size, shard_index, num_shards) for this host's data loader —
    feed into `data.mira.batch_iterator(num_shards=, shard_index=)`."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible by {n} hosts")
    return global_batch_size // n, jax.process_index(), n


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard the leading (batch) dim of every leaf over the given mesh axis.

    Single-process: a plain device_put. Multi-process: each host contributes its
    local per-host batch and the result is the global array
    (`jax.make_array_from_process_local_data`) — the leading dim of each leaf is
    the LOCAL batch and the global batch is local * process_count.
    """
    multihost = jax.process_count() > 1

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)

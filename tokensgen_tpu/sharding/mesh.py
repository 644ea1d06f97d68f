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


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard the leading (batch) dim of every leaf over the given mesh axis."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, tree)

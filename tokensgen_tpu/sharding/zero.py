"""ZeRO-1 optimizer-state sharding, the TPU-native way.

The reference reaches sharded optimizer state through DeepSpeed/bnb plumbing;
here it is pure sharding annotation: place every optimizer-state leaf sharded
over the ``data`` mesh axis and let XLA insert the reduce-scatter / all-gather
pair around the update (SURVEY §2.3 "sharded optimizer state if needed").

Per-leaf rule: shard the first dimension divisible by the axis size; leaves too
small to split stay replicated (their memory is negligible). Works for both the
fp32 AdamW moments and the blockwise-int8 moments of `train/adam8bit.py`
(quantized payloads and their per-block scales shard the same way).

Usage::

    opt_state = optimizer.init(params)
    opt_state = shard_opt_state(opt_state, mesh)      # instead of replicate()
    step = jax.jit(train_step, donate_argnums=(1,))   # sharding propagates
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(x, axis: str, size: int) -> P:
    shape = getattr(x, "shape", ())
    for i, d in enumerate(shape):
        if d % size == 0 and d >= size:
            return P(*([None] * i + [axis]))
    return P()


def opt_state_shardings(opt_state, mesh: Mesh, axis: str = "data"):
    """Pytree of NamedShardings (ZeRO-1 layout) matching ``opt_state``."""
    size = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _leaf_spec(x, axis, size)), opt_state)


def shard_opt_state(opt_state, mesh: Mesh, axis: str = "data"):
    """device_put every optimizer-state leaf into its ZeRO-1 sharding."""
    shardings = opt_state_shardings(opt_state, mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, opt_state, shardings)


def sharded_bytes_per_device(opt_state, mesh: Mesh, axis: str = "data") -> int:
    """Per-device bytes of the ZeRO-1 layout (for logging/asserts)."""
    size = mesh.shape[axis]
    total = 0
    for x in jax.tree_util.tree_leaves(opt_state):
        n = int(np.prod(getattr(x, "shape", ()) or (1,)))
        itemsize = getattr(getattr(x, "dtype", None), "itemsize", 4)
        div = size if _leaf_spec(x, axis, size) != P() else 1
        total += n * itemsize // div
    return total

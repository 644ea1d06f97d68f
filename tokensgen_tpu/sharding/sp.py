"""Ulysses-style sequence-parallel attention.

SURVEY §2.3: the reference has no SP — long context is handled algorithmically —
but lists head-sharded attention as the optional TPU build if the joint sequence
is ever grown. Implementation: inputs arrive sequence-sharded over the mesh
``model`` axis; an `all_to_all` re-shards heads<->sequence so each device runs
full-sequence attention over its local heads, then the inverse `all_to_all`
restores sequence sharding. The flash kernel runs unchanged per shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tokensgen_tpu.kernels.attention import flash_attention


def ulysses_attention(
    q: jnp.ndarray,  # [B, H, S, D] (global view)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Sequence-parallel bidirectional attention over the given mesh axis.

    Requires H and S divisible by the axis size. Communication: two
    `all_to_all`s (heads<->sequence) per call, riding ICI.
    """
    n = mesh.shape[axis]
    b, h, s, d = q.shape
    assert h % n == 0 and s % n == 0, (h, s, n)

    def local(q, k, v):
        # local views [B, H, S/n, D] -> heads-sharded [B, H/n, S, D]
        def a2a(x, fwd: bool):
            if fwd:
                return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                          tiled=True)
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                      tiled=True)

        qh, kh, vh = a2a(q, True), a2a(k, True), a2a(v, True)
        o = flash_attention(qh, kh, vh, scale=scale)
        return a2a(o, False)

    spec = P(None, None, axis, None)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)

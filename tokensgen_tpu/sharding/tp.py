"""Tensor parallelism for the DiT: Megatron-style param partition specs.

The reference has no TP (SURVEY §2.3 lists it as an optional rebuild target:
shard the 48 attention heads / FFN of the 5b DiT over a ``model`` axis for
>1-chip latency scaling). Here TP is *data layout, not model code*: we assign
`PartitionSpec`s to the parameter pytree —

* column-parallel: to_q/k/v (and vip_to_*), to_qkv, ff in-projection — kernel
  [.., in, out] sharded on `out`,
* row-parallel: to_out, ff out-projection — kernel sharded on `in` (XLA inserts
  the all-reduce after the matmul),
* everything else (norms, embeddings, heads) replicated,

and `jit` with these in_shardings; XLA's sharding propagation does the rest
(activations head-sharded through attention because q/k/v splits are head-major).

On TPU the Pallas flash-attention custom call does not auto-partition under jit
sharding propagation. Set ``DiTConfig(tp_axis="model")`` alongside these specs:
the attention op then shard_maps itself over the head dimension (see
`kernels/attention.py`), which requires an ambient mesh (``jax.set_mesh``).
Both paths are equality-tested in tests/test_tp.py.
"""

from __future__ import annotations

from typing import Dict

import flax
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("to_q", "to_k", "to_v", "to_qkv", "vip_to_q", "vip_to_k",
                   "vip_to_v", "vip_to_qkv", "net_0_proj")
ROW_PARALLEL = ("to_out", "net_2")


def dit_param_specs(params: Dict, axis: str = "model") -> Dict:
    """PartitionSpec pytree matching a `CogVideoXTransformer` param tree
    (handles the scan-stacked leading layer axis)."""
    flat = flax.traverse_util.flatten_dict(params)
    specs = {}
    for key, val in flat.items():
        spec = P()
        if len(key) >= 2 and key[-1] == "kernel":
            ndim = val.ndim  # 2 plain / 3 scan-stacked
            if key[-2] in COLUMN_PARALLEL:
                spec = P(*([None] * (ndim - 1) + [axis]))
            elif key[-2] in ROW_PARALLEL:
                spec = P(*([None] * (ndim - 2) + [axis, None]))
        elif len(key) >= 2 and key[-1] == "bias" and key[-2] in COLUMN_PARALLEL:
            spec = P(*([None] * (val.ndim - 1) + [axis]))
        specs[key] = spec
    return flax.traverse_util.unflatten_dict(specs)


def shard_dit_params(mesh: Mesh, params: Dict, axis: str = "model") -> Dict:
    specs = dit_param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
    )

"""Parameter utilities: memory-lean bf16 init for big models.

`flax.Module.init` materialises float32 parameters; for the 5b DiT that is ~20 GB
— more than a v5e chip's HBM. `init_params_bf16` uses `jax.eval_shape` to get the
parameter tree and fills it leaf-by-leaf with bf16 normal noise inside one jitted
program, so peak memory is the bf16 footprint only. (Real checkpoints are loaded
through `convert/`; this init exists for benchmarking and smoke tests.)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_params_bf16(init_fn, rng: jax.Array, *args, stddev: float = 0.02, **kwargs):
    shapes = jax.eval_shape(init_fn, rng, *args, **kwargs)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def fill(key):
        out = []
        for i, leaf in enumerate(leaves):
            k = jax.random.fold_in(key, i)
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                out.append(
                    (jax.random.normal(k, leaf.shape, jnp.bfloat16) * stddev).astype(
                        jnp.bfloat16
                    )
                )
            else:
                out.append(jnp.zeros(leaf.shape, leaf.dtype))
        return out

    return jax.tree_util.tree_unflatten(treedef, fill(rng))


def param_count(params: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def param_bytes(params: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))

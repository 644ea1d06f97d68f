"""LoRA for the DiT — functional low-rank adapters over the param pytree.

The reference's active LoRA path is peft `LoraConfig(r, lora_alpha,
target_modules=["to_k","to_q","to_v","to_out.0"])` injected into the
transformer (`/root/reference/train_cogvideo_to2v.py:1326-1338`; its custom
`longvgen/utils/lora*.py` stack is legacy). Here LoRA is a pytree transform:

* `init_lora(params, rank, targets)` -> {path: {"a": [.., in, r], "b": [.., r, out]}}
  (B zero-initialised, so merged == base at step 0),
* `merge_lora(params, lora, alpha)` -> params with kernel + a@b * (alpha/rank);
  differentiable w.r.t. the LoRA leaves, so training takes grads through the
  merge while the base stays frozen,
* works transparently with scan-stacked block params (leading layer axis).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp

DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out")


def _is_target(path: Tuple, targets: Sequence[str]) -> bool:
    return len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets


def init_lora(
    params: Dict,
    rng: jax.Array,
    rank: int = 128,
    targets: Sequence[str] = DEFAULT_TARGETS,
    stddev: float = 0.02,
) -> Dict:
    flat = flax.traverse_util.flatten_dict(params)
    lora = {}
    for path, w in flat.items():
        if not _is_target(path, targets):
            continue
        key = jax.random.fold_in(rng, hash(path) % (2**31))
        if w.ndim == 2:  # [in, out]
            a = jax.random.normal(key, (w.shape[0], rank), w.dtype) * stddev
            b = jnp.zeros((rank, w.shape[1]), w.dtype)
        elif w.ndim == 3:  # scan-stacked [L, in, out]
            a = jax.random.normal(key, (w.shape[0], w.shape[1], rank), w.dtype) * stddev
            b = jnp.zeros((w.shape[0], rank, w.shape[2]), w.dtype)
        else:
            continue
        lora[path] = {"a": a, "b": b}
    return {"/".join(map(str, k)): v for k, v in lora.items()}


def merge_lora(params: Dict, lora: Dict, rank: int, alpha: float = 64.0) -> Dict:
    scale = alpha / rank
    flat = flax.traverse_util.flatten_dict(params)
    out = dict(flat)
    for key_s, ab in lora.items():
        path = tuple(key_s.split("/"))
        w = flat[path]
        a, b = ab["a"], ab["b"]
        if w.ndim == 2:
            delta = (a @ b) * scale
        else:
            delta = jnp.einsum("lir,lro->lio", a, b) * scale
        out[path] = w + delta.astype(w.dtype)
    return flax.traverse_util.unflatten_dict(out)


def lora_param_count(lora: Dict) -> int:
    return sum(
        int(v.size) for ab in lora.values() for v in (ab["a"], ab["b"])
    )

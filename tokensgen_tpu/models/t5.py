"""T5 v1.1 encoder (flax) — the text encoder feeding the DiT (T5-XXL, 4096-dim,
226 tokens; SURVEY §2.5, `train_cogvideo_to2v.py` uses transformers' T5EncoderModel).

Own implementation rather than a transformers dependency: encoder-only stack with
* RMSNorm (scale-only, eps 1e-6), pre-norm residual blocks,
* unscaled attention (T5 uses no 1/sqrt(d)) with a shared relative-position bias
  (32 buckets, max distance 128, bidirectional) owned by layer 0,
* gated-GELU feed-forward (wi_0 ⊙ gelu, wi_1), no biases anywhere.

Text encoding is a one-time cost per prompt (cacheable), so attention here is a
plain XLA einsum rather than the Pallas kernel (which has no per-head bias path).

`convert/torch_weights.py::convert_t5` imports HF torch checkpoints into this
module's params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @classmethod
    def xxl(cls, **kw) -> "T5Config":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "T5Config":
        defaults = dict(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                        num_heads=4, dtype=jnp.float32)
        defaults.update(kw)
        return cls(**defaults)


def _relative_position_bucket(rel_pos: np.ndarray, num_buckets: int, max_distance: int):
    """Bidirectional T5 bucket function (host-side; positions are static)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int64) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(n.clip(1) / max_exact) / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


class T5SelfAttention(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x, pos_bias, mask):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name=name)
        b, s, _ = x.shape
        q = dense("q")(x).reshape(b, s, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = dense("k")(x).reshape(b, s, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = dense("v")(x).reshape(b, s, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
        scores = scores + pos_bias[None]  # [H, S, S]
        if mask is not None:
            scores = scores + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="o")(out)


class T5Block(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x, pos_bias, mask):
        cfg = self.config
        h = RMSNorm(cfg.layer_norm_eps, name="ln1")(x)
        x = x + T5SelfAttention(cfg, name="attn")(h, pos_bias, mask)
        h = RMSNorm(cfg.layer_norm_eps, name="ln2")(x)
        wi0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_0")(h)
        wi1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype, name="wi_1")(h)
        ff = nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype, name="wo")(
            nn.gelu(wi0, approximate=False) * wi1
        )
        return x + ff


class T5Encoder(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.config
        s = input_ids.shape[1]
        emb = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype, name="embed")(input_ids)

        # relative position bias: bucket table is static per sequence length
        pos = np.arange(s)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = _relative_position_bucket(
            rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
        )
        bias_table = self.param(
            "relative_attention_bias", nn.initializers.normal(0.02),
            (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32,
        )
        pos_bias = bias_table[jnp.asarray(buckets)].transpose(2, 0, 1)  # [H, S, S]

        x = emb
        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"block_{i}")(x, pos_bias, attention_mask)
        return RMSNorm(cfg.layer_norm_eps, name="final_ln")(x)

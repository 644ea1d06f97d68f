"""Perceiver Resampler — condenses a chunk's VAE latents into VIP tokens.

Behavioral parity with `/root/reference/longvgen/video_ipadapter/resampler.py`:
* learned latent queries [1, t·h·w = 4·8·12, dim], scaled-normal init (`:164`),
* `proj_in` per-frame, then depth x (PerceiverAttention + FeedForward) residual
  layers where q = latents and kv = [input ‖ latents] (`:100-101,224-226`),
* qk LayerNorm (eps 1e-6) on head dims, RoPE applied to the input part of k via
  `image_rotary_emb` and to q/latent part of k via `sampling_rotary_emb`
  (`:107-117`),
* `proj_out` + LayerNorm; output reshaped to [b, t, d, h, w] (`:242`),
* optional inference-time PCA bottleneck: keep first 16 principal components
  (`:230-237`) — here a pure function over a `PCAState` (see `core/pca.py`).

The attention itself reuses the shared Pallas flash-attention kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from tokensgen_tpu.core import pca as pca_lib
from tokensgen_tpu.core.rope import Rope, apply_rotary_emb
from tokensgen_tpu.kernels.attention import flash_attention
from tokensgen_tpu.models.layers import FeedForward, LayerNorm


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 3072
    depth: int = 4
    dim_head: int = 64
    heads: int = 16
    num_height_queries: int = 8
    num_width_queries: int = 12
    num_temporal_queries: int = 4
    embedding_dim: int = 3072  # input token dim (after patch_embed.proj)
    output_dim: int = 3072
    dtype: Any = jnp.bfloat16

    @property
    def num_queries(self) -> int:
        return (
            self.num_temporal_queries * self.num_height_queries * self.num_width_queries
        )

    @classmethod
    def tokensgen(cls, **kw) -> "ResamplerConfig":
        """The shipped To2V resampler (`config/infer/edit.yaml:44-57`)."""
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "ResamplerConfig":
        defaults = dict(dim=32, depth=2, dim_head=16, heads=2, num_height_queries=2,
                        num_width_queries=3, num_temporal_queries=2,
                        embedding_dim=16, output_dim=24, dtype=jnp.float32)
        defaults.update(kw)
        return cls(**defaults)


class PerceiverAttention(nn.Module):
    config: ResamplerConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, dim] input features
        latents: jnp.ndarray,  # [B, L, dim]
        image_rotary_emb: Optional[Rope] = None,
        sampling_rotary_emb: Optional[Rope] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        inner = cfg.dim_head * cfg.heads
        b, l, _ = latents.shape

        x = LayerNorm(name="norm1")(x)
        latents = LayerNorm(name="norm2")(latents)

        q = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=1)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=cfg.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(b, t.shape[1], cfg.heads, cfg.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        q = LayerNorm(epsilon=1e-6, name="norm_q")(q)
        k = LayerNorm(epsilon=1e-6, name="norm_k")(k)

        if image_rotary_emb is not None:
            k_in = apply_rotary_emb(k[:, :, :-l], image_rotary_emb)
            k = jnp.concatenate([k_in, k[:, :, -l:]], axis=2)
        if sampling_rotary_emb is not None:
            q = apply_rotary_emb(q, sampling_rotary_emb)
            k_lat = apply_rotary_emb(k[:, :, -l:], sampling_rotary_emb)
            k = jnp.concatenate([k[:, :, :-l], k_lat], axis=2)

        out = flash_attention(q, k, v, scale=cfg.dim_head**-0.5)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="to_out")(out)


class Resampler(nn.Module):
    config: ResamplerConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, F, N, embedding_dim] per-frame patch tokens
        image_rotary_emb: Optional[Rope] = None,
        sampling_rotary_emb: Optional[Rope] = None,
        pca: Optional[pca_lib.PCAState] = None,
        pca_keep: int = 16,
    ) -> jnp.ndarray:
        cfg = self.config
        b, f, n, _ = x.shape
        latents = self.param(
            "latents",
            lambda key, shape: jnp.asarray(
                nn.initializers.normal(stddev=1.0)(key, shape) / cfg.dim**0.5
            ),
            (1, cfg.num_queries, cfg.dim),
        )
        x = nn.Dense(cfg.dim, dtype=cfg.dtype, name="proj_in")(x.astype(cfg.dtype))
        x = x.reshape(b, f * n, cfg.dim)
        lat = jnp.broadcast_to(latents, (b,) + latents.shape[1:]).astype(cfg.dtype)

        for i in range(cfg.depth):
            lat = PerceiverAttention(cfg, name=f"layers_{i}_attn")(
                x, lat, image_rotary_emb, sampling_rotary_emb
            ) + lat
            lat = FeedForward(cfg.dim, dtype=cfg.dtype, name=f"layers_{i}_ff")(lat) + lat

        lat = nn.Dense(cfg.output_dim, dtype=cfg.dtype, name="proj_out")(lat)
        lat = LayerNorm(name="norm_out")(lat)

        if pca is not None:
            dtype = lat.dtype
            flat = lat.reshape(-1, cfg.output_dim).astype(pca.components.dtype)
            flat = pca_lib.bottleneck(pca, flat, keep=pca_keep)
            lat = flat.reshape(lat.shape).astype(dtype)

        t, hq, wq = cfg.num_temporal_queries, cfg.num_height_queries, cfg.num_width_queries
        return lat.reshape(b, t, hq, wq, cfg.output_dim).transpose(0, 1, 4, 2, 3)

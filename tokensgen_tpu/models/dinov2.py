"""DINOv2 image encoder (flax) for the non-VAE VIP conditioning path.

The reference pipeline optionally conditions the resampler on a pretrained
image encoder instead of VAE latents (`use_vae_as_encoder: false`,
`pipeline_cogvideox_mp_fifo.py:488-560`): frames are resized to 224, ImageNet-
normalised, encoded, and the PENULTIMATE hidden state's first 256 tokens feed
the resampler. The encoder is loaded with `AutoModel.from_pretrained`
(`train_cogvideo_to2v.py:1251-1253`) — a HF `Dinov2Model`.

This is that architecture in flax: patch conv + cls token + learned position
embeddings, pre-LN blocks with q/k/v bias, LayerScale on both branches, exact
GELU MLP. `forward` returns the penultimate hidden state (what the pipeline
consumes); weights convert from the HF state dict with :func:`convert_dinov2`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tokensgen_tpu.kernels.attention import flash_attention
from tokensgen_tpu.models.layers import LayerNorm

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class DINOv2Config:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 224
    layerscale: bool = True
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def large(cls, **kw) -> "DINOv2Config":
        """facebook/dinov2-large — 16x16+1 tokens at 224; hidden_states[-2][:, :256]
        is what the reference consumes."""
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "DINOv2Config":
        defaults = dict(hidden_size=32, num_layers=3, num_heads=2,
                        intermediate_size=64, patch_size=8, image_size=32)
        defaults.update(kw)
        return cls(**defaults)


class _Block(nn.Module):
    config: DINOv2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        d_head = cfg.hidden_size // cfg.num_heads
        b, s, _ = x.shape

        h = LayerNorm(name="norm1")(x)
        q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="q")(h)
        k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="k")(h)
        v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="v")(h)

        def heads(t):
            return t.reshape(b, s, cfg.num_heads, d_head).transpose(0, 2, 1, 3)

        attn = flash_attention(heads(q), heads(k), heads(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        attn = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="out")(attn)
        if cfg.layerscale:
            attn = attn * self.param(
                "lambda1", nn.initializers.ones, (cfg.hidden_size,))
        x = x + attn

        h = LayerNorm(name="norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(h)
        if cfg.layerscale:
            h = h * self.param("lambda2", nn.initializers.ones, (cfg.hidden_size,))
        return x + h


class DINOv2Encoder(nn.Module):
    """pixel_values [B, 3, H, W] (ImageNet-normalised) -> penultimate hidden
    state [B, 1 + num_patches, hidden] (cls token first)."""

    config: DINOv2Config

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        b = pixel_values.shape[0]
        p = cfg.patch_size
        x = pixel_values.astype(cfg.dtype).transpose(0, 2, 3, 1)  # NHWC
        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
                    dtype=cfg.dtype, name="patch_proj")(x)
        x = x.reshape(b, -1, cfg.hidden_size)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, 1 + cfg.num_patches, cfg.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x],
                            axis=1)
        x = x + pos.astype(cfg.dtype)

        # run all but the final block's output through; the PENULTIMATE hidden
        # state is the input of the last block's successor — i.e. the output
        # after num_layers-1 blocks (HF hidden_states[-2])
        for i in range(cfg.num_layers - 1):
            x = _Block(cfg, name=f"block_{i}")(x)
        return x


def preprocess_frames(frames: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[N, H, W, 3] in [-1, 1] -> ImageNet-normalised [N, 3, S, S] (antialiased
    resize; mirrors `_resize_with_antialiasing` + the HF processor normalize)."""
    import jax

    n, h, w, _ = frames.shape
    x = (frames.astype(jnp.float32) + 1.0) / 2.0
    x = jax.image.resize(x, (n, image_size, image_size, 3), method="linear",
                         antialias=True)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.transpose(0, 3, 1, 2)


def convert_dinov2(sd: Dict[str, np.ndarray], config: DINOv2Config) -> Dict:
    """HF `Dinov2Model` state dict -> our `DINOv2Encoder` params.

    Only the first num_layers-1 blocks are converted (the pipeline consumes the
    penultimate hidden state, so the final block and final layernorm are dead).
    """
    def lin(name):
        return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T),
                "bias": sd[f"{name}.bias"]}

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    w = sd["embeddings.patch_embeddings.projection.weight"]  # [D, 3, p, p]
    p = {
        "cls_token": sd["embeddings.cls_token"],
        "position_embeddings": sd["embeddings.position_embeddings"],
        "patch_proj": {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
    }
    for i in range(config.num_layers - 1):
        pre = f"encoder.layer.{i}"
        blk = {
            "norm1": ln(f"{pre}.norm1"),
            "q": lin(f"{pre}.attention.attention.query"),
            "k": lin(f"{pre}.attention.attention.key"),
            "v": lin(f"{pre}.attention.attention.value"),
            "out": lin(f"{pre}.attention.output.dense"),
            "norm2": ln(f"{pre}.norm2"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
        }
        if config.layerscale:
            blk["lambda1"] = sd[f"{pre}.layer_scale1.lambda1"]
            blk["lambda2"] = sd[f"{pre}.layer_scale2.lambda1"]
        p[f"block_{i}"] = blk
    return p


def load_dinov2(model_dir: str, config: DINOv2Config = DINOv2Config.large()):
    """Load HF torch weights from a local dir -> (DINOv2Encoder, params)."""
    import os

    from tokensgen_tpu.convert.safetensors_io import load_safetensors

    sd = {}
    for name in sorted(os.listdir(model_dir)):
        if name.endswith(".safetensors"):
            sd.update(load_safetensors(os.path.join(model_dir, name)))
    return DINOv2Encoder(config), {"params": convert_dinov2(sd, config)}

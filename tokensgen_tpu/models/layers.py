"""Shared flax building blocks: timestep embedding, feed-forward, AdaLN variants.

Behavioral references:
* `Timesteps`/`TimestepEmbedding` — diffusers sinusoidal projection + 2-layer MLP
  (`/root/reference/longvgen/models/embeddings.py` vendored parts; flip_sin_to_cos
  puts cos first).
* `CogVideoXLayerNormZero` — 6-way AdaLN with *per-frame* conditioning: the temb is
  [B, F, C] and scale/shift/gate repeat over the h·w tokens of each frame, while the
  text stream uses frame 0's modulation (`normalization.py:426-460`). This is the
  model feature that lets every latent frame carry its own diffusion timestep in
  FIFO sampling.
* `CogVideoXVIPLayerNormZero` — 3-way modulation for the vip token stream, frame-0
  temb (`normalization.py:462-488`).
* `FeedForward` — diffusers GELU-approximate MLP, mult 4.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def timestep_sinusoidal(
    t: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0
) -> jnp.ndarray:
    """[N] int timesteps -> [N, dim] sinusoidal features (float32)."""
    half = dim // 2
    exponent = -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    """2-layer silu MLP: [N, in_dim] sinusoidal features -> [N, time_embed_dim]."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)


class LayerNorm(nn.Module):
    """LayerNorm with float32 statistics regardless of compute dtype."""

    epsilon: float = 1e-5
    use_affine: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        if self.use_affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
            y = y * scale
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
                y = y + bias
        return y.astype(orig_dtype)


class LNParams(nn.Module):
    """Bare LayerNorm affine parameters (scale, bias) of shape [dim] — same
    names/init as :class:`LayerNorm`, for modules that run the normalization
    inside a fused kernel instead of applying it here."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


def _layer_norm_with(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     epsilon: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with explicit affine params (float32 stats)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + epsilon))
    return (y * scale + bias).astype(orig_dtype)


class QuantDense(nn.Module):
    """int8-quantized Dense (opt-in serving mode; no reference analog — the
    reference runs fp16/bf16 only). Params: ``kernel_q`` int8 [in, out] +
    ``scale`` f32 [out] (per-output-channel absmax), optional ``bias`` f32 —
    produced from a trained bf16 tree by ``models.dit.quantize_dit_params``.

    * ``w8a16``: bf16 activations x dequantized int8 weights — halves the
      weight bytes at rest (the 14.3 GB To2V DiT fits a 16 GB chip whole);
      MXU still runs bf16.
    * ``w8a8``: dynamic per-row activation quantization + int8xint8->int32
      MXU matmul (2x bf16 peak on v5e) — a labeled turbo mode, NOT used for
      baseline-parity numbers.
    """

    features: int
    mode: str = "w8a16"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        kq = self.param("kernel_q", nn.initializers.zeros_init(),
                        (in_f, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), jnp.float32)
        cdims = (((x.ndim - 1,), (0,)), ((), ()))
        if self.mode == "w8a8":
            ax = jnp.abs(x.astype(jnp.float32))
            rs = jnp.maximum(jnp.max(ax, axis=-1, keepdims=True), 1e-6) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / rs),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(xq, kq, cdims,
                                    preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * rs * scale).astype(self.dtype)
        elif self.mode == "w8a16":
            y = jax.lax.dot_general(x.astype(self.dtype),
                                    kq.astype(self.dtype), cdims)
            y = (y.astype(jnp.float32) * scale).astype(self.dtype)
        else:
            raise ValueError(f"unknown quant mode {self.mode!r}")
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def make_dense(features: int, *, quant=None, use_bias: bool = True,
               dtype=jnp.bfloat16, name: str):
    """nn.Dense or its QuantDense drop-in, by the config's ``quant`` field."""
    if quant:
        return QuantDense(features, mode=quant, use_bias=use_bias,
                          dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class FeedForward(nn.Module):
    """gelu-approximate MLP (diffusers `FeedForward` semantics, mult=4)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        x = make_dense(inner, quant=self.quant, dtype=self.dtype,
                       name="net_0_proj")(x)
        x = nn.gelu(x, approximate=True)
        return make_dense(self.dim, quant=self.quant, dtype=self.dtype,
                          name="net_2")(x)


def _per_frame_expand(t: jnp.ndarray, hw: int) -> jnp.ndarray:
    """[B, F, C] -> [B, F*hw, C] by repeating each frame's vector over its tokens."""
    b, f, c = t.shape
    return jnp.broadcast_to(t[:, :, None, :], (b, f, hw, c)).reshape(b, f * hw, c)


class AdaLNZero(nn.Module):
    """CogVideoX 6-way AdaLN ("LayerNormZero") with per-frame temb.

    Returns (norm_hidden, norm_text, gate, text_gate); gates are per-frame for the
    video stream and frame-0 for text. (A folded-table variant and a Pallas
    per-frame kernel were both measured SLOWER than this plain form in the full
    DiT block — 108.6 / 111.6 vs 106.0 ms/layer on the v5e; XLA already fuses
    the normalize+modulate chain. See PERF.md.)
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, hidden: jnp.ndarray, text: jnp.ndarray, temb: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, f, _ = temb.shape
        hw = hidden.shape[1] // f
        mods = nn.Dense(6 * self.dim, dtype=self.dtype, name="linear")(nn.silu(temb))
        shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mods, 6, axis=-1)
        norm = LayerNorm(name="norm")
        h = norm(hidden) * (1 + _per_frame_expand(scale, hw)) + _per_frame_expand(shift, hw)
        t = norm(text) * (1 + e_scale[:, :1]) + e_shift[:, :1]
        return h, t, _per_frame_expand(gate, hw), e_gate[:, :1]


class VIPAdaLN(nn.Module):
    """3-way AdaLN for the vip token stream; uses frame-0 temb
    (`normalization.py:462-488`)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, vip: jnp.ndarray, temb: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        mods = nn.Dense(3 * self.dim, dtype=self.dtype, name="linear")(nn.silu(temb))
        shift, scale, gate = jnp.split(mods, 3, axis=-1)
        out = LayerNorm(name="norm")(vip) * (1 + scale[:, :1]) + shift[:, :1]
        return out, gate[:, :1]


class AdaLayerNormOut(nn.Module):
    """Output-head AdaLN: silu(temb) -> (shift, scale), per-frame
    (`normalization.py:34-93`, chunk_dim=1 branch: shift first)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        b, f, _ = temb.shape
        hw = x.shape[1] // f
        mods = nn.Dense(2 * self.dim, dtype=self.dtype, name="linear")(nn.silu(temb))
        shift, scale = jnp.split(mods, 2, axis=-1)
        y = LayerNorm(use_affine=self.elementwise_affine, name="norm")(x)
        return y * (1 + _per_frame_expand(scale, hw)) + _per_frame_expand(shift, hw)

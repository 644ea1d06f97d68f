"""3-D causal VAE (CogVideoX family) in flax, channels-last, cache-as-carry.

Behavioral parity targets (`/root/reference/longvgen/models/autoencoder_kl_cogvideox.py`):
* causal temporal convs with the "fake context parallel" cache — the last k_t-1
  input frames of every causal conv carry across frame batches (`:67-145`). Here the
  cache is an **explicit pytree carry** threaded through `__call__` (functional, jit
  friendly) instead of module state,
* encoder: conv_in → 4 down blocks (3 resnets each; spatial downsample after blocks
  0-2, temporal after blocks 0-1) → mid (2 resnets) → norm/silu/conv_out to 2·16
  moments (`:611-744`),
* decoder: conv_in → mid → 4 up blocks (4 resnets each, **spatial norm conditioned
  on the latent zq**) → spatial-norm/silu/conv_out (`:745-885`),
* frame batching: encode in batches of 8 pixel frames (first batch 8+rem), decode in
  batches of 2 latent frames (first 2+rem), cache carried between batches
  (`:1085-1165`),
* spatial tiling with overlap blending (overlap 1/6 height, 1/5 width) and
  first-frame-aware temporal up/down sampling (`:1206-1360`, diffusers
  `CogVideoXDownsample3D`/`CogVideoXUpsample3D` semantics).

Layout: all internal tensors are **[B, T, H, W, C]** (channels-last; XLA-preferred
for convolutions). Public helpers accept/return the same layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Cache = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    temporal_compression_ratio: int = 4
    sample_height: int = 480
    sample_width: int = 720
    scaling_factor: float = 1.15258426
    dtype: Any = jnp.float32

    @property
    def temporal_compress_level(self) -> int:
        import math

        return int(math.log2(self.temporal_compression_ratio))

    @property
    def spatial_compression_ratio(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def cogvideox(cls, **kw) -> "VAEConfig":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "VAEConfig":
        defaults = dict(block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                        norm_num_groups=4, sample_height=32, sample_width=48)
        defaults.update(kw)
        return cls(**defaults)


class GroupNorm32(nn.Module):
    """GroupNorm with float32 statistics but activations kept in the compute
    dtype: flax's `_compute_stats` already accumulates mean/var in float32, so
    an explicit astype(float32) of the whole activation (a 6.5 GB materialised
    copy at decode resolution) is unnecessary — the fused reduction suffices."""

    groups: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=x.dtype)(x)


class Conv3dTap2d(nn.Module):
    """3-D convolution evaluated as a sum of per-temporal-tap 2-D convolutions.

    Parameter layout is identical to ``nn.Conv`` (kernel [kt,kh,kw,in,out],
    bias [out]) so checkpoints/converters are unaffected — but XLA:TPU lowers
    true 3-D convs ~4x slower than the equivalent 2-D convs with time folded
    into batch (measured 4.7 vs 20.9 TF/s for the 128-ch encoder shape on
    v5e), so the temporal axis is handled by tap summation. Input must already
    carry temporal context (kt-1 leading frames) and spatial padding; VALID.
    """

    features: int
    kernel_size: Tuple[int, int, int]
    strides_hw: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kh, kw, in_ch, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        b, tt, h, w, _ = x.shape
        t_out = tt - (kt - 1)
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        out = None
        for k in range(kt):
            xk = xd[:, k:k + t_out].reshape(b * t_out, h, w, in_ch)
            o = jax.lax.conv_general_dilated(
                xk, kd[k], self.strides_hw, "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = o if out is None else out + o
        out = out + bias.astype(self.dtype)
        return out.reshape((b, t_out) + out.shape[1:])


class CausalConv3d(nn.Module):
    """Temporally-causal 3D conv. Cache holds the last k_t-1 *input* frames; a
    missing cache entry replicates the first frame (pad_mode="first",
    `autoencoder_kl_cogvideox.py:120-145`)."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cache: Optional[Cache]) -> jnp.ndarray:
        kt, kh, kw = self.kernel_size
        key = "/".join(self.scope.path)
        if kt > 1:
            if cache is not None and key in cache:
                prefix = cache[key]
            else:
                prefix = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([prefix.astype(x.dtype), x], axis=1)
            if cache is not None:
                cache[key] = x[:, x.shape[1] - (kt - 1):]
        if kh > 1 or kw > 1:
            x = jnp.pad(
                x,
                ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
            )
        return Conv3dTap2d(
            self.features, self.kernel_size, dtype=self.dtype, name="conv"
        )(x)


def _nearest_resize(x: jnp.ndarray, size_thw: Tuple[int, int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of [B, T, H, W, C] to (T', H', W').

    Integer upscale ratios (every decoder level: x1/x2/x4/x8) lower to
    `jnp.repeat` broadcasts, which XLA fuses into the consumer — unlike the
    general gather-based `jax.image.resize` (a ~2.7 ms materialized pass at
    the 240x360 level)."""
    b, t, h, w, c = x.shape
    tt, th, tw = size_thw
    if tt % t == 0 and th % h == 0 and tw % w == 0:
        if tt != t:
            x = jnp.repeat(x, tt // t, axis=1)
        if th != h:
            x = jnp.repeat(x, th // h, axis=2)
        if tw != w:
            x = jnp.repeat(x, tw // w, axis=3)
        return x
    return jax.image.resize(x, (b,) + size_thw + (c,), method="nearest")


class SpatialNorm3D(nn.Module):
    """GroupNorm(f) modulated by conv(zq) with first-frame-aware nearest resize
    (`autoencoder_kl_cogvideox.py:148-188`)."""

    f_channels: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f: jnp.ndarray, zq: jnp.ndarray, cache: Optional[Cache]) -> jnp.ndarray:
        t = f.shape[1]
        # The 1x1x1 modulation convs are pointwise-linear, so they commute
        # exactly with the nearest resize: apply them at zq's (latent)
        # resolution — 64x fewer conv FLOPs and, far more importantly, the two
        # [*, H, W, C] full-resolution conv outputs are never materialized
        # (the repeat-resize broadcasts fuse into the modulate consumer).
        conv_y = CausalConv3d(self.f_channels, (1, 1, 1), dtype=self.dtype, name="conv_y")
        conv_b = CausalConv3d(self.f_channels, (1, 1, 1), dtype=self.dtype, name="conv_b")
        y_small = conv_y(zq, cache)
        b_small = conv_b(zq, cache)

        def resize(z):
            if t > 1 and t % 2 == 1:
                z_first = _nearest_resize(z[:, :1], (1,) + f.shape[2:4])
                z_rest = _nearest_resize(z[:, 1:], (t - 1,) + f.shape[2:4])
                return jnp.concatenate([z_first, z_rest], axis=1)
            return _nearest_resize(z, (t,) + f.shape[2:4])

        norm_f = GroupNorm32(self.groups, name="norm_layer")(f)
        return norm_f * resize(y_small) + resize(b_small)


class ResnetBlock3D(nn.Module):
    """GroupNorm/SpatialNorm → silu → causal conv, x2, + shortcut
    (`autoencoder_kl_cogvideox.py:191-311`)."""

    out_channels: int
    groups: int
    use_spatial_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, zq: Optional[jnp.ndarray], cache: Optional[Cache]
    ) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = x
        if self.use_spatial_norm:
            h = SpatialNorm3D(in_channels, self.groups, self.dtype, name="norm1")(h, zq, cache)
        else:
            h = GroupNorm32(self.groups, name="norm1")(h)
        h = nn.silu(h)
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv1")(h, cache)
        if self.use_spatial_norm:
            h = SpatialNorm3D(self.out_channels, self.groups, self.dtype, name="norm2")(h, zq, cache)
        else:
            h = GroupNorm32(self.groups, name="norm2")(h)
        h = nn.silu(h)
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv2")(h, cache)
        if in_channels != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1, 1), padding="VALID", dtype=self.dtype,
                name="conv_shortcut",
            )(x)
        return x + h


class Downsample3D(nn.Module):
    """Temporal avg-pool (first frame kept when odd) + strided spatial conv with
    right/bottom pad (diffusers `CogVideoXDownsample3D` semantics)."""

    out_channels: int
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.compress_time:
            t = x.shape[1]
            if t % 2 == 1 and t > 1:
                rest = x[:, 1:]
                rest = 0.5 * (rest[:, 0::2] + rest[:, 1::2])
                x = jnp.concatenate([x[:, :1], rest], axis=1)
            elif t > 1:
                x = 0.5 * (x[:, 0::2] + x[:, 1::2])
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        return Conv3dTap2d(
            self.out_channels, (1, 3, 3), strides_hw=(2, 2), dtype=self.dtype,
            name="conv",
        )(x)


class Upsample3D(nn.Module):
    """Nearest x2 upsample — temporal keeps the first frame single when the input
    is causal-odd — then 3x3 conv (diffusers `CogVideoXUpsample3D` semantics)."""

    out_channels: int
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        if self.compress_time:
            if t > 1 and t % 2 == 1:
                first = jnp.repeat(jnp.repeat(x[:, :1], 2, axis=2), 2, axis=3)
                rest = x[:, 1:]
                rest = jnp.repeat(jnp.repeat(jnp.repeat(rest, 2, axis=1), 2, axis=2), 2, axis=3)
                x = jnp.concatenate([first, rest], axis=1)
            elif t > 1:
                x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), 2, axis=3)
            else:
                x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        return Conv3dTap2d(
            self.out_channels, (1, 3, 3), dtype=self.dtype, name="conv"
        )(x)


class Encoder3D(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, cache: Optional[Cache]) -> jnp.ndarray:
        cfg = self.config
        chans = cfg.block_out_channels
        h = CausalConv3d(chans[0], dtype=cfg.dtype, name="conv_in")(x, cache)
        for i, ch in enumerate(chans):
            is_final = i == len(chans) - 1
            for j in range(cfg.layers_per_block):
                h = ResnetBlock3D(ch, cfg.norm_num_groups, dtype=cfg.dtype,
                                  name=f"down_{i}_res_{j}")(h, None, cache)
            if not is_final:
                h = Downsample3D(ch, compress_time=i < cfg.temporal_compress_level,
                                 dtype=cfg.dtype, name=f"down_{i}_downsample")(h)
        for j in range(2):
            h = ResnetBlock3D(chans[-1], cfg.norm_num_groups, dtype=cfg.dtype,
                              name=f"mid_res_{j}")(h, None, cache)
        h = GroupNorm32(cfg.norm_num_groups, name="norm_out")(h)
        h = nn.silu(h)
        return CausalConv3d(2 * cfg.latent_channels, dtype=cfg.dtype, name="conv_out")(h, cache)


class Decoder3D(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray, cache: Optional[Cache]) -> jnp.ndarray:
        cfg = self.config
        chans = tuple(reversed(cfg.block_out_channels))
        h = CausalConv3d(chans[0], dtype=cfg.dtype, name="conv_in")(z, cache)
        for j in range(2):
            h = ResnetBlock3D(chans[0], cfg.norm_num_groups, use_spatial_norm=True,
                              dtype=cfg.dtype, name=f"mid_res_{j}")(h, z, cache)
        for i, ch in enumerate(chans):
            is_final = i == len(chans) - 1
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock3D(ch, cfg.norm_num_groups, use_spatial_norm=True,
                                  dtype=cfg.dtype, name=f"up_{i}_res_{j}")(h, z, cache)
            if not is_final:
                h = Upsample3D(ch, compress_time=i < cfg.temporal_compress_level,
                               dtype=cfg.dtype, name=f"up_{i}_upsample")(h)
        h = SpatialNorm3D(chans[-1], cfg.norm_num_groups, dtype=cfg.dtype,
                          name="norm_out")(h, z, cache)
        h = nn.silu(h)
        return CausalConv3d(cfg.out_channels, dtype=cfg.dtype, name="conv_out")(h, cache)


class AutoencoderKLCogVideoX(nn.Module):
    """Holds encoder+decoder; call via the ``method=`` kwarg of `.apply`.

    ``cache`` is a plain dict carry: pass ``{}`` on the first frame batch (causal
    convs replicate the first frame) and the returned dict on subsequent batches.
    Pass ``None`` to disable caching entirely (single-shot encode of a whole clip).
    """

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder3D(self.config, name="encoder")
        self.decoder = Decoder3D(self.config, name="decoder")

    def encode(self, x: jnp.ndarray, cache: Optional[Cache] = None):
        moments = self.encoder(x, cache)
        return moments, cache

    def decode(self, z: jnp.ndarray, cache: Optional[Cache] = None):
        out = self.decoder(z, cache)
        return out, cache

    def __call__(self, x: jnp.ndarray):
        moments, _ = self.encode(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        out, _ = self.decode(mean)
        return out


def sample_latent(moments: jnp.ndarray, rng: Optional[jax.Array]) -> jnp.ndarray:
    """DiagonalGaussian sample (or mode when rng is None). moments: [..., 2C]."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if rng is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)


# ---------------------------------------------------------------------------
# frame-batched + tiled host-level drivers
# ---------------------------------------------------------------------------


def _frame_batches(num_frames: int, batch: int):
    """Reference frame-batch split (`:1092-1099`): first batch gets batch+rem."""
    if num_frames <= 1 or num_frames <= batch:
        return [(0, num_frames)]
    rem = num_frames % batch
    spans = []
    for i in range(num_frames // batch):
        start = batch * i + (0 if i == 0 else rem)
        spans.append((start, batch * (i + 1) + rem))
    return spans


class VAERunner:
    """Host-level driver around jitted encoder/decoder applies with cache carries.

    Mirrors the reference `AutoencoderKLCogVideoX` public surface: frame batching
    (8 pixel / 2 latent frames), optional slicing over batch, optional spatial
    tiling with overlap blending.
    """

    def __init__(self, config: VAEConfig, params, use_tiling: bool = False,
                 tile_sample_min_height: Optional[int] = None,
                 tile_sample_min_width: Optional[int] = None):
        self.config = config
        self.params = params
        self.model = AutoencoderKLCogVideoX(config)
        self.use_tiling = use_tiling
        self.auto_tile_decode = True
        self.num_sample_frames_batch_size = 8
        # stays at the reference's 2: the split is SEMANTIC, not just a perf
        # knob — GroupNorm statistics span the frames of a batch, so batch 4
        # (measured ~4% faster) changes outputs beyond rounding and breaks
        # the decode-causality contract at batch granularity
        self.num_latent_frames_batch_size = 2
        # tiled decode groups frames into 13-latent chunks (the reference
        # hard-codes nf_per_chunk=13 in tiled_decode, `:1317-1326`)
        self.nf_per_chunk = 13
        self.tile_sample_min_height = tile_sample_min_height or config.sample_height // 2
        self.tile_sample_min_width = tile_sample_min_width or config.sample_width // 2
        self.tile_overlap_factor_height = 1 / 6
        self.tile_overlap_factor_width = 1 / 5
        sc = config.spatial_compression_ratio
        self.tile_latent_min_height = self.tile_sample_min_height // sc
        self.tile_latent_min_width = self.tile_sample_min_width // sc

        self._encode_jit = jax.jit(
            lambda p, x, c: self.model.apply(p, x, c, method=AutoencoderKLCogVideoX.encode)
        )
        self._decode_jit = jax.jit(
            lambda p, z, c: self.model.apply(p, z, c, method=AutoencoderKLCogVideoX.decode)
        )

    # -- host offload (single-chip memory orchestration) --
    #
    # DiT + VAE + resampler params together exceed one 16 GB v5e (15.5 GB for
    # the production To2V stack), but the VAE is only needed at the very start
    # (encode) and end (decode) of a generation. Parking its params in host
    # memory during the denoise phase frees ~0.4 GB of HBM and, more
    # importantly, lets the whole stack share one chip at all.

    def offload_to_host(self):
        # keep a persistent host MASTER (params never mutate at inference):
        # the first offload pays one D2H copy, every later one is a free
        # rebind and every restore an H2D upload — never a repeat D2H
        if getattr(self, "_params_host", None) is None:
            self._params_host = jax.device_put(self.params,
                                               jax.devices("cpu")[0])
        self.params = self._params_host

    def restore_to_device(self, device=None):
        device = device or jax.devices()[0]
        src = getattr(self, "_params_host", None)
        self.params = jax.device_put(src if src is not None else self.params,
                                     device)

    # -- encode --

    def _encode_frames(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, F, H, W, 3] -> moments [B, f, h, w, 2C], frame-batched."""
        spans = _frame_batches(x.shape[1], self.num_sample_frames_batch_size)
        cache: Cache = {}
        outs = []
        for start, end in spans:
            moments, cache = self._encode_jit(self.params, x[:, start:end], cache)
            outs.append(moments)
        return jnp.concatenate(outs, axis=1)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_tiling and (
            x.shape[2] > self.tile_sample_min_height or x.shape[3] > self.tile_sample_min_width
        ):
            return self._tiled_encode(x)
        return self._encode_frames(x)

    # -- decode --

    def _decode_frames(self, z: jnp.ndarray) -> jnp.ndarray:
        spans = _frame_batches(z.shape[1], self.num_latent_frames_batch_size)
        cache: Cache = {}
        outs = []
        for start, end in spans:
            out, cache = self._decode_jit(self.params, z[:, start:end], cache)
            outs.append(out)
        return jnp.concatenate(outs, axis=1)

    def _decode_frames_chunked(self, z: jnp.ndarray) -> jnp.ndarray:
        """Tiled-decode frame layout (`tiled_decode`, `:1317-1337`): frames are
        grouped into `nf_per_chunk` (13) latent chunks, each chunk frame-batched
        2+rem, with the conv cache carried across ALL chunks of one tile.
        (Deviation: the reference silently DROPS the frames past the last whole
        chunk; here a trailing partial chunk is decoded as a short chunk.)"""
        nf = self.nf_per_chunk
        f = z.shape[1]
        cache: Cache = {}
        outs = []
        for c0 in range(0, f, nf):
            chunk_f = min(nf, f - c0)
            spans = _frame_batches(chunk_f, self.num_latent_frames_batch_size)
            for start, end in spans:
                out, cache = self._decode_jit(
                    self.params, z[:, c0 + start:c0 + end], cache)
                outs.append(out)
        return jnp.concatenate(outs, axis=1)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        # Big decodes always tile: a full-frame 480x720 bf16 decode compiles
        # to a ~17 GB program (up_3-level 480x720x256 temporaries x 9 px
        # frames) and cannot fit the 16 GB v5e — the same reason the reference
        # ships tiled_decode (`:1190-1250`). The auto path only engages at
        # production-scale latents (>= ~360x480 px output); tiny debug configs
        # decode whole-frame.
        big = z.shape[2] * z.shape[3] >= 2400
        if (self.use_tiling or (self.auto_tile_decode and big)) and (
            z.shape[2] > self.tile_latent_min_height or z.shape[3] > self.tile_latent_min_width
        ):
            return self._tiled_decode(z)
        return self._decode_frames(z)

    # -- tiling (`:1206-1360`) --

    @staticmethod
    def _blend_v(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
        extent = min(a.shape[2], b.shape[2], extent)
        if extent <= 0:
            return b
        w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(1, 1, extent, 1, 1)
        blended = a[:, :, a.shape[2] - extent:] * (1 - w) + b[:, :, :extent] * w
        return jnp.concatenate([blended.astype(b.dtype), b[:, :, extent:]], axis=2)

    @staticmethod
    def _blend_h(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
        extent = min(a.shape[3], b.shape[3], extent)
        if extent <= 0:
            return b
        w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(1, 1, 1, extent, 1)
        blended = a[:, :, :, a.shape[3] - extent:] * (1 - w) + b[:, :, :, :extent] * w
        return jnp.concatenate([blended.astype(b.dtype), b[:, :, :, extent:]], axis=3)

    def _tiled(self, x: jnp.ndarray, tile_h: int, tile_w: int, overlap_h: int,
               overlap_w: int, blend_h: int, blend_w: int, limit_h: int,
               limit_w: int, fn, out_h: int, out_w: int) -> jnp.ndarray:
        rows = []
        for i in range(0, x.shape[2], overlap_h):
            row = []
            for j in range(0, x.shape[3], overlap_w):
                tile = x[:, :, i:i + tile_h, j:j + tile_w]
                row.append(fn(tile))
            rows.append(row)
        result_rows = []
        for i, row in enumerate(rows):
            result_row = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = self._blend_v(rows[i - 1][j], tile, blend_h)
                if j > 0:
                    tile = self._blend_h(row[j - 1], tile, blend_w)
                # the reference blends IN PLACE (`blend_v`/`blend_h` mutate b,
                # `:1253-1267`), so later tiles blend against already-blended
                # neighbors — write the blended tile back to match
                rows[i][j] = tile
                result_row.append(tile[:, :, :limit_h, :limit_w])
            result_rows.append(jnp.concatenate(result_row, axis=3))
        # crop to the exact target — clipped edge tiles can over-produce
        # (the reference crops the assembled canvas the same way, `:1248-1249`)
        return jnp.concatenate(result_rows, axis=2)[:, :, :out_h, :out_w]

    def _tiled_encode(self, x: jnp.ndarray) -> jnp.ndarray:
        overlap_h = int(self.tile_sample_min_height * (1 - self.tile_overlap_factor_height))
        overlap_w = int(self.tile_sample_min_width * (1 - self.tile_overlap_factor_width))
        blend_h = int(self.tile_latent_min_height * self.tile_overlap_factor_height)
        blend_w = int(self.tile_latent_min_width * self.tile_overlap_factor_width)
        limit_h = self.tile_latent_min_height - blend_h
        limit_w = self.tile_latent_min_width - blend_w
        sc = self.config.spatial_compression_ratio
        return self._tiled(
            x, self.tile_sample_min_height, self.tile_sample_min_width,
            overlap_h, overlap_w, blend_h, blend_w, limit_h, limit_w,
            self._encode_frames, x.shape[2] // sc, x.shape[3] // sc,
        )

    def _tiled_decode(self, z: jnp.ndarray) -> jnp.ndarray:
        overlap_h = int(self.tile_latent_min_height * (1 - self.tile_overlap_factor_height))
        overlap_w = int(self.tile_latent_min_width * (1 - self.tile_overlap_factor_width))
        blend_h = int(self.tile_sample_min_height * self.tile_overlap_factor_height)
        blend_w = int(self.tile_sample_min_width * self.tile_overlap_factor_width)
        limit_h = self.tile_sample_min_height - blend_h
        limit_w = self.tile_sample_min_width - blend_w
        sc = self.config.spatial_compression_ratio
        return self._tiled(
            z, self.tile_latent_min_height, self.tile_latent_min_width,
            overlap_h, overlap_w, blend_h, blend_w, limit_h, limit_w,
            self._decode_frames_chunked, z.shape[2] * sc, z.shape[3] * sc,
        )

"""CogVideoX 3-D diffusion transformer (To2V and T2To share this class), in flax.

Behavioral parity targets (cited into `/root/reference/`):
* joint [text ‖ video (‖ vip)] token sequence with AdaLN-zero blocks and per-frame
  2-D timesteps (`longvgen/models/cogvideox_transformer_3d.py:636-770`),
* the VIP conditioning branch — parallel vip-projected attention grafted into every
  block (`cogvideox_transformer_3d.py:145-332`,
  `attention_processor.py:1955-2156`, func_type "1"),
* `use_output_projection=False` raw-token output mode and `patch_size=1` used by
  T2To (`cogvideox_transformer_3d.py:419,745-762`),
* final norm over the full joint sequence for rotary models (5b) vs video-only for
  non-rotary (2b) (`cogvideox_transformer_3d.py:731-743`).

TPU-first design choices (not a port):
* blocks run under `nn.scan` with stacked parameters (one compiled block body
  instead of 42 unrolled ones) and optional `nn.remat` gradient checkpointing,
* attention is a single Pallas flash-attention kernel per pattern with RoPE applied
  outside the kernel (see `kernels/attention.py`),
* VIP weight grafting (vip_to_q := to_q etc., `cogvideox_transformer_3d.py:207-218`)
  is a pytree init-time transform (`graft_vip_params`), not module mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from tokensgen_tpu.kernels.attention import (
    concat_tabs,
    fused_flash_attention,
    make_prologue,
    slice_tabs,
)
from tokensgen_tpu.core.rope import Rope
from tokensgen_tpu.models.layers import (
    AdaLNZero,
    AdaLayerNormOut,
    FeedForward,
    LayerNorm,
    TimestepEmbedding,
    VIPAdaLN,
    make_dense,
    timestep_sinusoidal,
)


@dataclasses.dataclass(frozen=True)
class VIPConfig:
    """Video IP-Adapter conditioning branch (SURVEY §2 #2/#4).

    ``func_type`` selects the processor variant
    (`attention_processor.py:1955-2662`):
      "1" (shipped): bidirectional — [text‖video]→vip cross-attn added with scale,
          vip stream attends [text‖video‖vip];
      "2": video-only queries for the cross-attn (text untouched by vip), vip
          stream attends [video‖vip];
      "3": one-way — video→vip cross-attn only, vip stream passes through blocks
          unchanged;
      "4": adds an autoregressive context branch — the first ``ar_length`` video
          tokens are a separate "ar" stream with its own AdaLN, a second
          cross-attn (scale_ar) from [text‖video] into the ar tokens, and a joint
          [ar‖vip] -> [text‖video‖ar‖vip] attention (`:2418-2662`).
    """

    length: int = 480  # vip tokens per forward = 5 query-frames x 8 x 12
    scale: float = 1.0
    scale_ar: float = 1.0
    func_type: str = "1"
    ar_length: int = 0  # "4" only: leading video tokens forming the ar stream
    output_dim: int = 3072  # resampler output dim feeding vip_proj
    num_temporal_queries: int = 4
    num_height_queries: int = 8
    num_width_queries: int = 12


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    num_attention_heads: int = 30
    attention_head_dim: int = 64
    in_channels: int = 16
    out_channels: int = 16
    time_embed_dim: int = 512
    text_embed_dim: int = 4096
    num_layers: int = 30
    patch_size: int = 2
    sample_width: int = 90
    sample_height: int = 60
    sample_frames: int = 49
    temporal_compression_ratio: int = 4
    max_text_seq_length: int = 226
    spatial_interpolation_scale: float = 1.875
    temporal_interpolation_scale: float = 1.0
    use_rotary_positional_embeddings: bool = False
    use_output_projection: bool = True
    attention_bias: bool = True
    qk_norm: bool = True
    vip: Optional[VIPConfig] = None
    dtype: Any = jnp.bfloat16
    remat: bool = False
    # fused q/k/v projections (one matmul), the `FusedCogVideoXAttnProcessor2_0`
    # analog (`attention_processor.py:2663-2733`); also fuses the VIP branch's
    # vip_to_{q,k,v} -> vip_to_qkv (same operand, func_types 1-4). Measured on
    # v5e: XLA runs an [S,3072]x[3072,3072] projection at ~71 TF/s but the
    # fused [S,3072]x[3072,9216] at ~131 TF/s. Convert params with
    # `fuse_qkv_params` / `unfuse_qkv_params`
    fuse_qkv: bool = False
    # fuse the VIP branch's vip_to_{q,k,v} too. Default OFF even when
    # fuse_qkv is on: measured on v5e, base-only fusion gives 7.14 s/step
    # but fusing the vip projections too REGRESSES to 7.67 (vs 7.38
    # unfused) — XLA already co-schedules the three same-operand vip
    # projections, and the fused wide matmul over the concat operand loses
    # that. PERF.md round 3.
    fuse_vip_qkv: bool = False
    # tensor-parallel mesh axis: when set, attention ops shard_map themselves
    # over heads on this axis (see kernels/attention.py). Use together with
    # sharding/tp.py param specs and an ambient mesh (`jax.set_mesh`).
    tp_axis: Optional[str] = None
    # sequence-parallel (Ulysses) mesh axis: when set, attention ops shard_map
    # themselves over the SEQUENCE dimension with an in-shard all_to_all
    # (seq<->heads) around the unchanged kernel — sharding/sp.py pattern,
    # SURVEY §2.3 optional SP target. The shard_map's seq-sharded output spec
    # propagates through GSPMD, so the downstream to_out/FF matmuls run
    # sequence-sharded too. Mutually exclusive with tp_axis; requires the
    # joint sequence lengths and head count divisible by the axis size.
    sp_axis: Optional[str] = None
    # evaluate the joint-sequence FeedForward in N sequential sequence chunks
    # (lax.map): caps the [B, S, 4*inner] gelu intermediate at 1/N size so the
    # CFG-batched B=2 forward of the 7.17B model fits a 16 GB chip. 1 = off.
    ff_chunks: int = 1
    # int8 quantization of the per-block attention/FF projections (opt-in
    # serving mode, no reference analog): None | "w8a16" (weight-only — DiT
    # weight bytes halve, full 42-layer depth fits one 16 GB chip) | "w8a8"
    # (dynamic activation quant + int8 MXU matmuls). Convert a trained bf16
    # tree with `quantize_dit_params` AFTER any `graft_vip_params` /
    # `fuse_qkv_params` transforms.
    quant: Optional[str] = None
    # int8 score matmul inside the packed flash-attention kernel (dynamic
    # per-q-block/per-kv-column scales). Part of the labeled int8 serving
    # turbo alongside quant="w8a8"; inference-only (gradients stay bf16).
    quant_attn: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    # --- model registry (SURVEY §2.5) ---

    @classmethod
    def cogvideox_5b(cls, **kw) -> "DiTConfig":
        defaults = dict(
            num_attention_heads=48,
            num_layers=42,
            use_rotary_positional_embeddings=True,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def cogvideox_2b(cls, **kw) -> "DiTConfig":
        return cls(**kw)

    @classmethod
    def t2to_5b(cls, **kw) -> "DiTConfig":
        """T2To: 5b clone with patch_size=1 denoising condensed tokens
        [B, 4·chunks, 16, 8, 12] (`train_cogvideo_t2to.py:1269-1284`)."""
        defaults = dict(
            num_attention_heads=48,
            num_layers=42,
            use_rotary_positional_embeddings=True,
            patch_size=1,
            sample_width=12,
            sample_height=8,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def tiny(cls, **kw) -> "DiTConfig":
        """2-layer debug config for integration tests (SURVEY §4 item 3)."""
        defaults = dict(
            num_attention_heads=2,
            attention_head_dim=16,
            num_layers=2,
            time_embed_dim=32,
            text_embed_dim=24,
            max_text_seq_length=8,
            sample_width=16,
            sample_height=8,
            use_rotary_positional_embeddings=True,
            dtype=jnp.float32,
        )
        defaults.update(kw)
        return cls(**defaults)


class QKNorm(nn.Module):
    """Per-head-dim LayerNorm on q/k (eps 1e-6, affine), float32 stats.

    Holds the parameters only (same pytree paths as before: ``<name>/ln/...``);
    the normalization itself runs inside the fused attention prologue
    (`kernels/attention.py::fused_flash_attention`), folded together with RoPE
    so the HBM-bound elementwise pass disappears from the XLA graph. Call with
    a tensor for standalone use, or with no argument to get (scale, bias).
    """

    dim: int = 64

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None):
        from tokensgen_tpu.models.layers import LNParams, _layer_norm_with

        scale, bias = LNParams(self.dim, name="ln")()
        if x is None:
            return scale, bias
        return _layer_norm_with(x, scale, bias, epsilon=1e-6)


class JointVIPAttention(nn.Module):
    """Joint self-attention over [text‖video], with optional VIP branch.

    VIP branch (func_type "1", `attention_processor.py:1955-2156`): a second set of
    projections (vip_to_{q,k,v}, grafted from base weights at init) produces
    (a) text_video→vip cross-attention added to the base output with a per-sample
    scale and (b) vip→[text_video‖vip] attention for the token stream. RoPE tables
    differ per stream and are applied to the video segment only.
    """

    config: DiTConfig

    @nn.compact
    def __call__(
        self,
        text_video: jnp.ndarray,  # [B, T+Sv, D]
        vip: Optional[jnp.ndarray],  # [B, Lv, D] or None
        text_len: int,
        image_rotary_emb: Optional[Rope],
        vip_image_rotary_emb: Optional[Rope],
        vip_condition_rotary_emb: Optional[Rope],
        key_bias: Optional[jnp.ndarray] = None,
        vip_scale: Optional[jnp.ndarray] = None,
        ar: Optional[jnp.ndarray] = None,  # [B, La, D] ("4" only, normed)
    ):
        cfg = self.config
        inner, heads, dt = cfg.inner_dim, cfg.num_attention_heads, cfg.dtype
        d = cfg.attention_head_dim
        sm_scale = d ** -0.5

        def attn(q_, k_, v_, tq_, tk_, **kw):
            # merged [B, S, H*D] operands: no head-transposes, no d=64 lane
            # padding; dispatches to the packed head-pair kernel on TPU
            return fused_flash_attention(
                q_, k_, v_, tq_, tk_, heads=heads, norm_q=cfg.qk_norm,
                norm_k=cfg.qk_norm, tp_axis=cfg.tp_axis, sp_axis=cfg.sp_axis,
                int8_scores=cfg.quant_attn, **kw)

        def dense(name):
            return make_dense(inner, quant=cfg.quant,
                              use_bias=cfg.attention_bias, dtype=dt, name=name)

        def qkv_proj(prefix, *segments):
            # one [3072, 9216] matmul instead of three [3072, 3072] ones when
            # fused (the square shape underutilizes the MXU, see
            # DiTConfig.fuse_qkv). The fused module is applied PER SEGMENT
            # (row-wise identical) so the concatenated operand is never
            # materialized as a wide-matmul input; XLA's simplifier folds the
            # downstream slice(concat(outs)) back to the segments.
            fuse_this = cfg.fuse_qkv if not prefix else cfg.fuse_vip_qkv
            if fuse_this:
                mod = make_dense(3 * inner, quant=cfg.quant,
                                 use_bias=cfg.attention_bias, dtype=dt,
                                 name=prefix + "to_qkv")
                outs = [mod(s) for s in segments]
                fused = (outs[0] if len(outs) == 1
                         else jnp.concatenate(outs, axis=1))
                return jnp.split(fused, 3, axis=-1)
            op = (segments[0] if len(segments) == 1
                  else jnp.concatenate(segments, axis=1))
            return (dense(prefix + "to_q")(op),
                    dense(prefix + "to_k")(op),
                    dense(prefix + "to_v")(op))

        def ln_params(name):
            if cfg.qk_norm:
                return QKNorm(d, name=name)()
            return None, None

        q, k, v = qkv_proj("", text_video)
        # qk-norm and rope run inside the kernel prologue: per-position tables
        # with identity rows for the text segment (video-only rope)
        gq, bq = ln_params("norm_q")
        gk, bk = ln_params("norm_k")
        s_video = text_video.shape[1] - text_len
        base_segs = [(None, text_len), (image_rotary_emb, s_video)]
        tabs_q = make_prologue(d, base_segs, gq, bq, fold=sm_scale)
        tabs_k = make_prologue(d, base_segs, gk, bk)
        out = attn(q, k, v, tabs_q, tabs_k, key_bias=key_bias)  # [B, T+Sv, H*D]

        vip_attn_out = None
        ar_attn_out = None
        ft = cfg.vip.func_type if cfg.vip is not None else None
        if ft == "4":
            assert vip is not None and ar is not None
            la = ar.shape[1]
            lv = vip.shape[1]
            tv_len = text_video.shape[1]
            vq, vk, vv = qkv_proj("vip_", text_video, vip, ar)
            vgq, vbq = ln_params("vip_norm_q")
            vgk, vbk = ln_params("vip_norm_k")
            # ar tokens take the leading temporal positions of the vip-image
            # rope table, video the rest (`:2525-2542`); vip takes the condition
            # table. Segment layout of allseq: [text ‖ video ‖ vip ‖ ar].
            if vip_image_rotary_emb is not None:
                vi_cos, vi_sin = vip_image_rotary_emb
                ar_rope = (vi_cos[..., :la, :], vi_sin[..., :la, :])
                vid_rope = (vi_cos[..., la:, :], vi_sin[..., la:, :])
            else:
                ar_rope = vid_rope = None
            segs = [(None, text_len), (vid_rope, tv_len - text_len),
                    (vip_condition_rotary_emb, lv), (ar_rope, la)]
            vtabs_q = make_prologue(d, segs, vgq, vbq, fold=sm_scale)
            vtabs_k = make_prologue(d, segs, vgk, vbk)
            q_tv, q_vip, q_ar = (vq[:, :tv_len], vq[:, tv_len:tv_len + lv],
                                 vq[:, tv_len + lv:])
            k_tv, k_vip, k_ar = (vk[:, :tv_len], vk[:, tv_len:tv_len + lv],
                                 vk[:, tv_len + lv:])
            v_tv, v_vip, v_ar = (vv[:, :tv_len], vv[:, tv_len:tv_len + lv],
                                 vv[:, tv_len + lv:])
            tq_tv = slice_tabs(vtabs_q, 0, tv_len)
            tq_vip = slice_tabs(vtabs_q, tv_len, tv_len + lv)
            tq_ar = slice_tabs(vtabs_q, tv_len + lv, tv_len + lv + la)
            tk_tv = slice_tabs(vtabs_k, 0, tv_len)
            tk_vip = slice_tabs(vtabs_k, tv_len, tv_len + lv)
            tk_ar = slice_tabs(vtabs_k, tv_len + lv, tv_len + lv + la)

            cross_vip = attn(q_tv, k_vip, v_vip, tq_tv, tk_vip)
            cross_ar = attn(q_tv, k_ar, v_ar, tq_tv, tk_ar)
            scale = cfg.vip.scale if vip_scale is None else vip_scale
            scale = jnp.asarray(scale, dtype=out.dtype)
            scale = scale.reshape(scale.shape + (1,) * (out.ndim - scale.ndim))
            out = out + scale * cross_vip + cfg.vip.scale_ar * cross_ar
            arvip = attn(
                jnp.concatenate([q_ar, q_vip], axis=1),
                jnp.concatenate([k_tv, k_ar, k_vip], axis=1),
                jnp.concatenate([v_tv, v_ar, v_vip], axis=1),
                concat_tabs(tq_ar, tq_vip),
                concat_tabs(tk_tv, tk_ar, tk_vip),
            )
            ar_attn_out, vip_attn_out = arvip[:, :la], arvip[:, la:]
        elif cfg.vip is not None:
            assert vip is not None
            # "1": vip-projected queries/keys over [text‖video]; "2"/"3": video only
            tv_input = text_video if ft == "1" else text_video[:, text_len:]
            tv_len = tv_input.shape[1]
            lv = vip.shape[1]
            vq, vk, vv = qkv_proj("vip_", tv_input, vip)
            vgq, vbq = ln_params("vip_norm_q")
            vgk, vbk = ln_params("vip_norm_k")
            # "1": text identity + video vip-image rope; "2"/"3": whole tv_input
            # (video only) gets the vip-image rope. vip segment: condition rope
            # on keys always, on queries except "3" (whose vip queries are
            # unused — the vip stream passes through, `:2404-2416`).
            if ft == "1":
                tv_segs = [(None, text_len), (vip_image_rotary_emb, tv_len - text_len)]
            else:
                tv_segs = [(vip_image_rotary_emb, tv_len)]
            vtabs_q = make_prologue(
                d, tv_segs + [(vip_condition_rotary_emb, lv)], vgq, vbq,
                fold=sm_scale)
            vtabs_k = make_prologue(
                d, tv_segs + [(vip_condition_rotary_emb, lv)], vgk, vbk)
            q_tv, q_vip = vq[:, :tv_len], vq[:, tv_len:]
            k_tv, k_vip = vk[:, :tv_len], vk[:, tv_len:]
            v_tv, v_vip = vv[:, :tv_len], vv[:, tv_len:]

            # (text_)video -> vip cross attention, added with per-sample scale
            tv_cross = attn(q_tv, k_vip, v_vip,
                            slice_tabs(vtabs_q, 0, tv_len),
                            slice_tabs(vtabs_k, tv_len, tv_len + lv))
            scale = cfg.vip.scale if vip_scale is None else vip_scale
            scale = jnp.asarray(scale, dtype=out.dtype)
            scale = scale.reshape(scale.shape + (1,) * (out.ndim - scale.ndim))
            if ft == "1":
                out = out + scale * tv_cross
            else:  # video positions only; text untouched (`:2271-2272,2401`)
                out = jnp.concatenate(
                    [out[:, :text_len], out[:, text_len:] + scale * tv_cross],
                    axis=1,
                )
            if ft != "3":
                # vip -> [(text_)video ‖ vip] (`:2120-2125,2264-2269`)
                vip_attn_out = attn(
                    q_vip,
                    jnp.concatenate([k_tv, k_vip], axis=1),
                    jnp.concatenate([v_tv, v_vip], axis=1),
                    slice_tabs(vtabs_q, tv_len, tv_len + lv),
                    vtabs_k,
                )

        if ft == "4":
            # [text ‖ ar ‖ video ‖ vip] through the shared to_out (`:2634-2641`)
            merged = jnp.concatenate(
                [out[:, :text_len], ar_attn_out, out[:, text_len:], vip_attn_out],
                axis=1,
            )
        elif vip_attn_out is not None:
            merged = jnp.concatenate([out, vip_attn_out], axis=1)
        else:
            merged = out
        proj = make_dense(inner, quant=cfg.quant, use_bias=True, dtype=dt,
                          name="to_out")(merged)
        text_out = proj[:, :text_len]
        if cfg.vip is not None and ft != "3":
            vip_len = vip.shape[1]
            video_out = proj[:, text_len:-vip_len]
            vip_out = proj[:, -vip_len:]
        elif cfg.vip is not None:
            # V3: vip stream bypasses attention entirely (`:2404-2416`)
            video_out, vip_out = proj[:, text_len:], vip
        else:
            video_out, vip_out = proj[:, text_len:], None
        return video_out, text_out, vip_out


class DiTBlock(nn.Module):
    """One CogVideoX block: AdaLN-zero -> joint(+vip) attention -> AdaLN-zero -> FF
    (`cogvideox_transformer_3d.py:221-332`). The vip stream gets its own 3-way
    AdaLN and a separate pass through the *shared* FF."""

    config: DiTConfig

    @nn.compact
    def __call__(self, carry, _):
        hidden, text, vip, temb, ropes, key_bias, vip_scale = carry
        cfg = self.config
        (image_rope, vip_image_rope, vip_cond_rope) = ropes
        text_len = text.shape[1]

        ft = cfg.vip.func_type if cfg.vip is not None else None
        ar = None
        if ft == "4":
            # leading ar context tokens form their own stream (`:237-243`)
            la = cfg.vip.ar_length
            ar, hidden = hidden[:, :la], hidden[:, la:]

        norm_h, norm_t, gate, t_gate = AdaLNZero(cfg.inner_dim, dtype=cfg.dtype, name="norm1")(
            hidden, text, temb
        )
        if cfg.vip is not None and ft != "3":
            norm_vip, vip_gate = VIPAdaLN(cfg.inner_dim, dtype=cfg.dtype, name="vip_norm1")(
                vip, temb
            )
        elif cfg.vip is not None:
            # V3: vip stream untouched (`cogvideox_transformer_3d.py:260-262`)
            norm_vip, vip_gate = vip, 0.0
        else:
            norm_vip = None
        norm_ar = None
        if ft == "4":
            norm_ar, ar_gate = VIPAdaLN(cfg.inner_dim, dtype=cfg.dtype, name="ar_norm1")(
                ar, temb
            )

        tv = jnp.concatenate([norm_t, norm_h], axis=1)
        video_attn, text_attn, vip_attn = JointVIPAttention(cfg, name="attn1")(
            tv, norm_vip, text_len, image_rope, vip_image_rope, vip_cond_rope,
            key_bias, vip_scale, ar=norm_ar,
        )
        if ft == "4":
            ar_attn, video_attn = video_attn[:, :cfg.vip.ar_length], video_attn[:, cfg.vip.ar_length:]
            ar = ar + ar_gate * ar_attn
        hidden = hidden + gate * video_attn
        text = text + t_gate * text_attn
        if cfg.vip is not None:
            vip = vip + vip_gate * vip_attn

        norm_h, norm_t, gate2, t_gate2 = AdaLNZero(cfg.inner_dim, dtype=cfg.dtype, name="norm2")(
            hidden, text, temb
        )
        ff = FeedForward(cfg.inner_dim, dtype=cfg.dtype, quant=cfg.quant,
                         name="ff")

        def ff_apply(x):
            n = cfg.ff_chunks
            if n <= 1 or x.shape[1] % n:
                return ff(x)
            bx, sx, cx = x.shape
            chunks = x.reshape(bx, n, sx // n, cx).transpose(1, 0, 2, 3)
            scan_fn = nn.scan(
                lambda mdl, carry, xc: (carry, mdl(xc)),
                variable_broadcast="params", split_rngs={"params": False},
                in_axes=0, out_axes=0,
            )
            _, out = scan_fn(ff, None, chunks)
            return out.transpose(1, 0, 2, 3).reshape(bx, sx, cx)

        joint_in = jnp.concatenate([norm_t, norm_h], axis=1)
        pad_s = -joint_in.shape[1] % cfg.ff_chunks
        if cfg.ff_chunks > 1 and pad_s:
            ff_out = ff_apply(jnp.pad(joint_in, ((0, 0), (0, pad_s), (0, 0))))
            ff_out = ff_out[:, :joint_in.shape[1]]
        else:
            ff_out = ff_apply(joint_in)
        hidden = hidden + gate2 * ff_out[:, text_len:]
        text = text + t_gate2 * ff_out[:, :text_len]
        if cfg.vip is not None and ft != "3":
            norm_vip2, vip_gate2 = VIPAdaLN(cfg.inner_dim, dtype=cfg.dtype, name="vip_norm2")(
                vip, temb
            )
            vip = vip + vip_gate2 * ff(norm_vip2)
        if ft == "4":
            norm_ar2, ar_gate2 = VIPAdaLN(cfg.inner_dim, dtype=cfg.dtype, name="ar_norm2")(
                ar, temb
            )
            ar = ar + ar_gate2 * ff(norm_ar2)
            hidden = jnp.concatenate([ar, hidden], axis=1)

        return (hidden, text, vip, temb, ropes, key_bias, vip_scale), None


class CogVideoXTransformer(nn.Module):
    """Full DiT. Forward signature mirrors the reference's
    `CogVideoXTransformer3DModel.forward` (`cogvideox_transformer_3d.py:636-770`)
    with torch-isms replaced by explicit data:

    * ``timestep``: [B] or [B, F] int array (per-frame timesteps are first-class),
    * ``vip_hidden_states``: pre-resampled condensed tokens [B, Tq, Cv, Hq, Wq],
    * rotary tables are passed in (computed host-side per shape),
    * ``key_bias``: optional [B, T+Sv] additive attention mask (T2To padded chunks).

    Returns [B, F, C, H, W] (unpatchified prediction) when
    ``use_output_projection`` else the raw normed hidden states reshaped to
    [B, F, C, H, W] token layout (T2To raw-token mode).
    """

    config: DiTConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # [B, F, C, H, W]
        encoder_hidden_states: jnp.ndarray,  # [B, T, text_embed_dim]
        timestep: jnp.ndarray,  # [B] or [B, F]
        vip_hidden_states: Optional[jnp.ndarray] = None,
        image_rotary_emb: Optional[Rope] = None,
        vip_image_rotary_emb: Optional[Rope] = None,
        vip_condition_rotary_emb: Optional[Rope] = None,
        vip_pos_embedding: Optional[jnp.ndarray] = None,
        key_bias: Optional[jnp.ndarray] = None,
        vip_scale: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        b, f, c, h, w = hidden_states.shape
        p = cfg.patch_size
        dt = cfg.dtype

        # 1. time embedding: [B(,F)] -> [B, Ft, time_embed_dim]
        ts = timestep if timestep.ndim == 2 else timestep[:, None]
        ft = ts.shape[1]
        t_feat = timestep_sinusoidal(ts.reshape(-1), cfg.inner_dim).astype(dt)
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=dt, name="time_embedding")(
            t_feat
        ).reshape(b, ft, cfg.time_embed_dim)

        # 2. patch embedding
        text = nn.Dense(cfg.inner_dim, dtype=dt, name="text_proj")(
            encoder_hidden_states.astype(dt)
        )
        if cfg.use_output_projection:
            x = hidden_states.astype(dt).reshape(b * f, c, h, w).transpose(0, 2, 3, 1)
            x = nn.Conv(
                cfg.inner_dim, (p, p), strides=(p, p), padding="VALID", dtype=dt,
                name="patch_proj",
            )(x)
            video = x.reshape(b, f * (h // p) * (w // p), cfg.inner_dim)
        else:
            video = hidden_states.astype(dt).transpose(0, 1, 3, 4, 2).reshape(b, f * h * w, c)
            video = nn.Dense(cfg.inner_dim, dtype=dt, name="patch_proj_dense")(video)

        vip = None
        if cfg.vip is not None:
            assert vip_hidden_states is not None
            bv, tv, cv, hv, wv = vip_hidden_states.shape
            vtokens = vip_hidden_states.astype(dt).transpose(0, 1, 3, 4, 2).reshape(
                bv, tv * hv * wv, cv
            )
            vip = nn.Dense(cfg.inner_dim, dtype=dt, name="vip_proj")(vtokens)

        if not cfg.use_rotary_positional_embeddings:
            # 2b-style absolute sincos embeddings (precomputed, passed via module
            # constant); text part is zero.
            from tokensgen_tpu.core.rope import get_3d_sincos_pos_embed

            pe = get_3d_sincos_pos_embed(
                cfg.inner_dim,
                (w // p, h // p),
                f,
                cfg.spatial_interpolation_scale,
                cfg.temporal_interpolation_scale,
            ).reshape(1, -1, cfg.inner_dim)
            video = video + jnp.asarray(pe, dtype=dt)
            if vip is not None and vip_pos_embedding is not None:
                vip = vip + vip_pos_embedding.astype(dt)

        text_len = text.shape[1]

        # 3. transformer blocks under scan (stacked params)
        block_cls = DiTBlock
        if cfg.remat:
            block_cls = nn.remat(DiTBlock, prevent_cse=False)
        blocks = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
            metadata_params={nn.PARTITION_NAME: "layers"},
        )(cfg, name="blocks")
        ropes = (image_rotary_emb, vip_image_rotary_emb, vip_condition_rotary_emb)
        carry = (video, text, vip, temb, ropes, key_bias, vip_scale)
        (video, text, vip, *_), _ = blocks(carry, None)

        # 4. final norm (+ output head)
        if not cfg.use_rotary_positional_embeddings:
            hidden = LayerNorm(name="norm_final")(video)
        else:
            # reference concatenates [text(+vip)] then video and takes the tail
            joint = jnp.concatenate([text] + ([vip] if vip is not None else []) + [video], axis=1)
            joint = LayerNorm(name="norm_final")(joint)
            hidden = joint[:, -video.shape[1]:]

        f_out = f
        if cfg.vip is not None and cfg.vip.func_type == "4":
            # drop the ar context tokens from the prediction (`:740-741,755-756`)
            hidden = hidden[:, cfg.vip.ar_length:]
            f_out = f - cfg.vip.ar_length // ((h // p) * (w // p))

        if cfg.use_output_projection:
            hidden = AdaLayerNormOut(cfg.inner_dim, dtype=dt, name="norm_out")(hidden, temb)
            hidden = nn.Dense(p * p * cfg.out_channels, dtype=dt, name="proj_out")(hidden)
            out = hidden.reshape(b, f_out, h // p, w // p, cfg.out_channels, p, p)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, f_out, cfg.out_channels, h, w)
        else:
            hidden = AdaLayerNormOut(
                cfg.inner_dim, dtype=dt, elementwise_affine=False, name="norm_out"
            )(hidden, temb)
            out = hidden.reshape(b, f, h, w, -1).transpose(0, 1, 4, 2, 3)
        return out


_QKV_GROUPS = (
    (("to_q", "to_k", "to_v"), "to_qkv"),
    (("vip_to_q", "vip_to_k", "vip_to_v"), "vip_to_qkv"),
)


def fuse_qkv_params(params, fuse_vip: bool = False):
    """to_q/to_k/to_v -> to_qkv and (``fuse_vip``) vip_to_q/k/v -> vip_to_qkv
    (concat along the output dim), for a model built with ``fuse_qkv=True``
    (`fuse_qkv_projections`, `cogvideox_transformer_3d.py:552-575`). Works on
    scan-stacked blocks."""
    import flax

    groups = _QKV_GROUPS if fuse_vip else _QKV_GROUPS[:1]
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    done = set()
    for key, val in flat.items():
        group = next((g for g in groups
                      if len(key) >= 2 and key[-2] in g[0]), None)
        if group is None:
            out[key] = val
            continue
        names, fused_name = group
        base = key[:-2]
        if (base, fused_name) in done:
            continue
        done.add((base, fused_name))
        for leaf in ("kernel", "bias"):
            parts = [flat.get(base + (n, leaf)) for n in names]
            if parts[0] is None:
                continue
            out[base + (fused_name, leaf)] = jnp.concatenate(parts, axis=-1)
    return flax.traverse_util.unflatten_dict(out)


def unfuse_qkv_params(params):
    """Inverse of :func:`fuse_qkv_params` (both base and vip groups)."""
    import flax

    fused_to_names = {f: n for n, f in _QKV_GROUPS}
    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for key, val in flat.items():
        names = fused_to_names.get(key[-2]) if len(key) >= 2 else None
        if names is not None:
            base, leaf = key[:-2], key[-1]
            for name, part in zip(names, jnp.split(val, 3, axis=-1)):
                out[base + (name, leaf)] = part
        else:
            out[key] = val
    return flax.traverse_util.unflatten_dict(out)


# per-block dense projections that the `quant` mode replaces with QuantDense
_QUANTIZED_DENSE = (
    "to_q", "to_k", "to_v", "to_qkv",
    "vip_to_q", "vip_to_k", "vip_to_v", "vip_to_qkv",
    "to_out", "net_0_proj", "net_2",
)


def quantize_dit_params(params, config: DiTConfig):
    """bf16/f32 DiT tree -> the int8 layout of a model built with
    ``quant="w8a16"|"w8a8"``: each per-block attention/FF ``kernel`` becomes
    ``kernel_q`` int8 + per-output-channel f32 ``scale`` (absmax). Embedding/
    patch/output projections stay full precision (tiny share of the bytes).
    Apply AFTER `graft_vip_params` / `fuse_qkv_params` — quantization is the
    last transform. Works on scan-stacked [L, in, out] kernels (scale gets
    the leading L axis the scanned QuantDense expects)."""
    if not config.quant:
        return params
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for key, val in flat.items():
        in_blocks = "blocks" in key[:-2]
        if (in_blocks and len(key) >= 2 and key[-1] == "kernel"
                and key[-2] in _QUANTIZED_DENSE):
            k = jnp.asarray(val, jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(k), axis=-2), 1e-12) / 127.0
            kq = jnp.clip(jnp.round(k / scale[..., None, :]),
                          -127, 127).astype(jnp.int8)
            out[key[:-1] + ("kernel_q",)] = kq
            out[key[:-1] + ("scale",)] = scale
        elif (in_blocks and len(key) >= 2 and key[-1] == "bias"
                and key[-2] in _QUANTIZED_DENSE):
            out[key] = jnp.asarray(val, jnp.float32)
        else:
            out[key] = val
    return flax.traverse_util.unflatten_dict(out)


def graft_vip_params(params, config: DiTConfig):
    """Initialise the VIP branch from the base attention weights, as the reference
    does when grafting adapters onto a pretrained model
    (`cogvideox_transformer_3d.py:207-218`): vip_to_{q,k,v} <- to_{q,k,v},
    vip_norm_{q,k} <- norm_{q,k}. Operates on the stacked scan params pytree."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = dict(flat)
    for key, val in flat.items():
        key_s = "/".join(str(k) for k in key)
        if "attn1" in key_s:
            for base, vip_name in (
                ("to_q", "vip_to_q"),
                ("to_k", "vip_to_k"),
                ("to_v", "vip_to_v"),
                ("to_qkv", "vip_to_qkv"),
                ("norm_q", "vip_norm_q"),
                ("norm_k", "vip_norm_k"),
            ):
                if base in key:
                    new_key = tuple(vip_name if k == base else k for k in key)
                    if new_key in flat:
                        out[new_key] = val
            if "to_qkv" in key:
                # fused base, unfused vip target (mixed layouts): split thirds
                # into the vip projections when those keys exist
                q_, k_, v_ = jnp.split(val, 3, axis=-1)
                for vip_name, part in (("vip_to_q", q_), ("vip_to_k", k_),
                                       ("vip_to_v", v_)):
                    new_key = tuple(vip_name if k == "to_qkv" else k
                                    for k in key)
                    if new_key in flat:
                        out[new_key] = part
    return flax.traverse_util.unflatten_dict(out)

"""T2To training: full-model finetune on PCA-compressed condensed-token latents.

Reference semantics (`/root/reference/train_cogvideo_t2to.py`):
* trains ALL transformer params of a 5b clone with patch_size=1 (`:1269-1284`),
* inputs are condensed tokens — either precomputed or produced online from VAE
  latents via the frozen patch-proj + Resampler (`vip_encode_video`, `:1715-1740`),
  then `pca_normalization`: pca.transform -> (x - mean)/std -> keep 16 components
  (`:1761-1773`),
* per-sample attention masks hide padded chunks in self-attention (`:1076-1096`;
  an outer-product key/query mask — equivalent here to a key-bias since padded
  queries are loss-masked) and loss masks zero their loss (`:1098-1108`),
* RoPE dims (52, 6, 6) over the 8x12 token grid (`:2068-2092`),
* same x0-space weighted v-pred loss; optional `vip_1` re-warped schedule
  (`:1316-1317`); bs 3/GPU, accum 5, lr 3e-4.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tokensgen_tpu.core import pca as pca_lib
from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
from tokensgen_tpu.train import objective


@dataclasses.dataclass(frozen=True)
class T2ToTrainConfig:
    optimizer: str = "adamw"  # adam | adamw | prodigy (`get_optimizer`)
    use_8bit_adam: bool = False  # T2To reference config trains full-precision
    learning_rate: float = 3e-4
    lr_scheduler: str = "constant"  # diffusers get_scheduler names
    lr_warmup_steps: int = 0
    lr_num_cycles: int = 1
    lr_power: float = 1.0
    max_train_steps: int = 1000
    weight_decay: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.95
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    num_processes: int = 1
    rope_dims: tuple = (52, 6, 6)
    height: int = 8
    width: int = 12
    keep_components: int = 16
    # LoRA finetune mode (reference peft path, `train_cogvideo_to2v.py:
    # 1326-1338`, default-off): rank > 0 freezes the full 5b clone and trains
    # only low-rank a/b factors over the target projections — params become
    # {"dit": frozen tree, "lora": factors} (train/lora.py).
    lora_rank: int = 0
    lora_alpha: float = 64.0
    lora_targets: tuple = ("to_q", "to_k", "to_v", "to_out")


def pca_normalization(
    tokens: jnp.ndarray,  # [B, F, 3072, h, w]
    pca: pca_lib.PCAState,
    mean: jnp.ndarray,  # [1, D]
    std: jnp.ndarray,
    keep: int = 16,
) -> jnp.ndarray:
    """-> [B, F, keep, h, w] normalised token latents (`:1761-1773`)."""
    b, f, c, h, w = tokens.shape
    flat = tokens.transpose(0, 1, 3, 4, 2).reshape(-1, c).astype(jnp.float32)
    y = pca_lib.transform(pca, flat)
    y = (y - mean) / std
    y = y[:, :keep]
    return y.reshape(b, f, h, w, keep).transpose(0, 1, 4, 2, 3)


def padded_chunk_masks(valid_frames: jnp.ndarray, num_frames: int, hw: int,
                       text_len: int):
    """(key_bias [B, text+F*hw], loss_mask [B, F, 1, 1, 1]) from per-sample valid
    token-frame counts."""
    frame_ids = jnp.arange(num_frames)
    valid = frame_ids[None, :] < valid_frames[:, None]  # [B, F]
    token_valid = jnp.repeat(valid, hw, axis=1)  # [B, F*hw]
    text_ones = jnp.ones((valid.shape[0], text_len), bool)
    key_valid = jnp.concatenate([text_ones, token_valid], axis=1)
    key_bias = jnp.where(key_valid, 0.0, -1e9).astype(jnp.float32)
    loss_mask = valid[:, :, None, None, None].astype(jnp.float32)
    return key_bias, loss_mask


def make_optimizer(cfg: T2ToTrainConfig,
                   accum_steps: int = 1) -> optax.GradientTransformation:
    from tokensgen_tpu.train import optim

    lr = optim.lr_schedule(cfg.lr_scheduler, cfg.learning_rate,
                           cfg.lr_warmup_steps, cfg.max_train_steps,
                           num_cycles=cfg.lr_num_cycles, power=cfg.lr_power)
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optim.base_optimizer(cfg.optimizer, lr, b1=cfg.adam_beta1,
                             b2=cfg.adam_beta2, eps=cfg.adam_eps,
                             weight_decay=cfg.weight_decay,
                             use_8bit=cfg.use_8bit_adam),
    )
    if accum_steps > 1:
        # reference trains with gradient_accumulation_steps=5
        # (`config/train/*_t2to.yaml:68-93`); the f32 accumulation buffer is
        # ZeRO-1-sharded with the rest of the optimizer state
        opt = optax.MultiSteps(opt, every_k_schedule=accum_steps)
    if cfg.lora_rank > 0:
        # LoRA mode: optimizer state only for the lora factors; the frozen
        # base gets set_to_zero (same pattern as the To2V adapter masking)
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: "train"
                if path and getattr(path[0], "key", None) == "lora"
                else "freeze", params),
        )
    return opt


def make_train_step(
    dit_config: DiTConfig,
    sched: S.DiffusionSchedule,
    cfg: T2ToTrainConfig,
    optimizer: optax.GradientTransformation,
):
    """`train_step(params, opt_state, batch, rng)`.

    ``batch``: latents [B, F, 16, h, w] (pca-normalised), text_embeds [B, T, 4096],
    valid_frames [B] int, optional process_index.
    """
    dit = CogVideoXTransformer(dit_config)
    dt_, dh_, dw_ = cfg.rope_dims

    def loss_fn(params, batch, rng):
        if isinstance(params, dict) and "lora" in params:
            from tokensgen_tpu.train.lora import merge_lora

            params = merge_lora(params["dit"], params["lora"],
                                cfg.lora_rank, cfg.lora_alpha)
        r_t, r_noise = jax.random.split(rng)
        latents = batch["latents"]
        b, f = latents.shape[0], latents.shape[1]
        hw = cfg.height * cfg.width
        text_len = batch["text_embeds"].shape[1]

        timesteps = objective.sample_uniform_timesteps(
            r_t, b, sched.config.num_train_timesteps,
            batch.get("process_index"), cfg.num_processes,
        )
        noise = jax.random.normal(r_noise, latents.shape, dtype=latents.dtype)
        noisy = S.add_noise(sched, latents, noise, timesteps)

        rope = get_3d_rotary_pos_embed_v2(
            dit_config.attention_head_dim,
            np.arange(f, dtype=np.float32),
            np.arange(cfg.height, dtype=np.float32),
            np.arange(cfg.width, dtype=np.float32),
            dim_t=dt_, dim_h=dh_, dim_w=dw_,
        )
        key_bias, loss_mask = padded_chunk_masks(
            batch["valid_frames"], f, hw, text_len
        )
        model_out = dit.apply(
            {"params": params},
            noisy, batch["text_embeds"], timesteps,
            image_rotary_emb=rope, key_bias=key_bias,
        ).astype(jnp.float32)
        return objective.x0_weighted_loss(
            sched, model_out, noisy.astype(jnp.float32), latents.astype(jnp.float32),
            timesteps, loss_mask=loss_mask,
        )

    def train_step(params, opt_state, batch, rng):
        if isinstance(params, dict) and "lora" in params:
            # differentiate ONLY the lora factors: the frozen 5b base enters
            # the trace as constants (same rationale as To2V's partition —
            # no dead dW matmuls/buffers for the frozen tree)
            def loss_on_lora(lora):
                return loss_fn({"dit": params["dit"], "lora": lora},
                               batch, rng)

            loss, g_lora = jax.value_and_grad(loss_on_lora)(params["lora"])
            gnorm = optax.global_norm(g_lora)
            grads = {
                "dit": jax.tree_util.tree_map(jnp.zeros_like, params["dit"]),
                "lora": g_lora,
            }
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def vip_encode_video_latents(
    dit_config: DiTConfig,
    dit_params,
    resampler_config: ResamplerConfig,
    resampler_params,
    vae_latents: jnp.ndarray,  # [B, 13*chunks, 16, 60, 90]
    resampler_image_rotary_emb=None,
    resampler_sampling_rotary_emb=None,
    nf_per_chunk: int = 13,
) -> jnp.ndarray:
    """Precomputed VAE latents -> condensed tokens via frozen patch-proj + Resampler
    (`train_cogvideo_t2to.py:1715-1740`). Returns [B, 4*chunks, 3072, 8, 12]."""
    from tokensgen_tpu.pipelines.to2v import apply_patch_proj

    resampler = Resampler(resampler_config)
    num_chunks = vae_latents.shape[1] // nf_per_chunk
    outs = []
    for cid in range(num_chunks):
        lat = vae_latents[:, cid * nf_per_chunk:(cid + 1) * nf_per_chunk]
        tokens = apply_patch_proj(dit_config, dit_params, lat)
        outs.append(resampler.apply(
            resampler_params, tokens,
            resampler_image_rotary_emb, resampler_sampling_rotary_emb,
        ))
    return jnp.concatenate(outs, axis=1)

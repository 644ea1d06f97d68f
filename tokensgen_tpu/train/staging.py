"""To2V training-batch staging: VAE encode, random windows, VIP conditioning,
per-sample rotary tables.

Mirrors the reference trainer's per-step data flow
(`/root/reference/train_cogvideo_to2v.py:1727-1976`):
* encode the 2-chunk pixel window per chunk (`encode_video`, `:1606-1619`),
* pick a random 13-latent-frame window per sample (`relative_start_idx`),
* VIP tokens from the (possibly CFG-dropped -> zeros-video) VAE latents through the
  DiT patch conv + frozen-or-trainable Resampler, per chunk; then select the
  window's 5 token frames by searchsorted (`:1928-1976`),
* absolute positional grids: vip grids start at `start_frame_idx` (+1000 for the
  condition stream), giving the model its global clock (`:1745-1751,1848-1926`).

Per-sample rotary tables are built with the traced-grid rope builder under vmap —
[B, S, D] tables that `apply_rotary_emb` broadcasts per sample.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tokensgen_tpu.core.rope import (
    get_3d_rotary_pos_embed,
    get_3d_rotary_pos_embed_v2,
    get_3d_rotary_pos_embed_v2_jnp,
)
from tokensgen_tpu.models.dit import DiTConfig
from tokensgen_tpu.models.resampler import ResamplerConfig
from tokensgen_tpu.models.vae3d import VAERunner, sample_latent


def encode_video_chunks(vae: VAERunner, pixel_values: jnp.ndarray,
                        nf_px: int, rng: Optional[jax.Array]) -> jnp.ndarray:
    """[B, F_px, H, W, 3] -> [B, F_lat, C, h, w] per-chunk VAE encode."""
    outs = []
    for cid in range(pixel_values.shape[1] // nf_px):
        chunk = pixel_values[:, cid * nf_px:(cid + 1) * nf_px]
        moments = vae.encode(chunk)
        key = None if rng is None else jax.random.fold_in(rng, cid)
        lat = sample_latent(moments, key) * vae.config.scaling_factor
        outs.append(lat.transpose(0, 1, 4, 2, 3))
    return jnp.concatenate(outs, axis=1)


def stage_to2v_batch(
    dit_config: DiTConfig,
    dit_params,
    resampler_config: ResamplerConfig,
    vae: VAERunner,
    pixel_values: jnp.ndarray,  # [B, chunks*nf_px, H, W, 3]
    start_frame_idx: np.ndarray,  # [B] absolute compressed-frame start
    drop_image_embed: np.ndarray,  # [B] 0/1 CFG dropout
    text_embeds: jnp.ndarray,
    rng: jax.Array,
    nf_px: int = 49,
    video_ipadapter_start_frame_idx: int = 1000,
    host_rng: Optional[np.random.Generator] = None,
) -> Dict:
    """Returns the batch dict consumed by `to2v.make_train_step`."""
    from tokensgen_tpu.pipelines.to2v import apply_patch_proj

    host_rng = host_rng or np.random.default_rng(0)
    b = pixel_values.shape[0]
    num_chunks = pixel_values.shape[1] // nf_px
    nf = (nf_px - 1) // 4 + 1  # 13
    rc = resampler_config
    d = dit_config.attention_head_dim
    vq = rc.num_temporal_queries
    n_vip = min(vq + 1, nf)

    r_enc, r_tokens = jax.random.split(rng)
    all_latents = encode_video_chunks(vae, pixel_values, nf_px, r_enc)
    f_all = all_latents.shape[1]

    # random window per sample (`:1731-1738`)
    rel = np.asarray([
        host_rng.integers(0, max(1, f_all - nf - 1 + 1)) for _ in range(b)
    ])
    idx = rel[:, None] + np.arange(nf)[None, :]
    latents = jnp.take_along_axis(
        all_latents, jnp.asarray(idx)[:, :, None, None, None], axis=1
    )

    # VIP conditioning: CFG dropout swaps in zeros-video latents (`:1743,1962`)
    uncond_pixels = jnp.zeros_like(pixel_values)
    uncond_latents = encode_video_chunks(vae, uncond_pixels, nf_px, None)
    drop = jnp.asarray(drop_image_embed).astype(bool)[:, None, None, None, None]
    cond_latents = jnp.where(drop, uncond_latents, all_latents)

    grid_h_full = np.arange(dit_config.sample_height // dit_config.patch_size, dtype=np.float32)
    grid_w_full = np.arange(dit_config.sample_width // dit_config.patch_size, dtype=np.float32)
    gh = grid_h_full.shape[0]
    gw = grid_w_full.shape[0]
    rs_image_rope = get_3d_rotary_pos_embed_v2(
        d, np.arange(nf, dtype=np.float32), grid_h_full, grid_w_full)
    rs_sampling_rope = get_3d_rotary_pos_embed_v2(
        d,
        np.linspace(video_ipadapter_start_frame_idx,
                    video_ipadapter_start_frame_idx + nf, vq, endpoint=False,
                    dtype=np.float32),
        np.linspace(0, gh, rc.num_height_queries, endpoint=False, dtype=np.float32),
        np.linspace(0, gw, rc.num_width_queries, endpoint=False, dtype=np.float32),
    )

    # patch-projected per-chunk tokens; the resampler itself runs inside the
    # training loss (it is trainable and needs gradients)
    tok_chunks = []
    for cid in range(num_chunks):
        lat = cond_latents[:, cid * nf:(cid + 1) * nf]
        tok_chunks.append(apply_patch_proj(dit_config, dit_params, lat))
    vip_input_chunks = jnp.stack(tok_chunks, axis=1)  # [B, C, nf, N, E]

    # window-aligned token-frame indices by searchsorted (`:1950-1976`)
    rel_grid = np.concatenate([
        np.linspace(c * nf, (c + 1) * nf, vq, endpoint=False, dtype=np.float32)
        for c in range(num_chunks)
    ])
    emb_idx = np.searchsorted(rel_grid, rel, side="right") - 1
    emb_sel = emb_idx[:, None] + np.arange(n_vip)[None, :]
    emb_sel = np.minimum(emb_sel, vq * num_chunks - 1)

    # ropes
    image_rope = get_3d_rotary_pos_embed(
        d, ([0, 0, 0], [nf, gh, gw]), (nf, gh, gw)
    )
    abs_idx = np.asarray(start_frame_idx, dtype=np.float32)
    vip_img_grid_t = jnp.asarray(abs_idx)[:, None] + jnp.asarray(rel)[:, None] + jnp.arange(nf)[None, :]

    def img_rope_fn(gt):
        return get_3d_rotary_pos_embed_v2_jnp(d, gt, jnp.asarray(grid_h_full), jnp.asarray(grid_w_full))

    vip_image_rope = jax.vmap(img_rope_fn)(vip_img_grid_t.astype(jnp.float32))

    cond_base = video_ipadapter_start_frame_idx + abs_idx  # [B]
    cond_grid_full = (
        jnp.asarray(cond_base)[:, None]
        + jnp.asarray(rel_grid)[None, :]
    )  # [B, vq*chunks]
    cond_sel = jnp.take_along_axis(cond_grid_full, jnp.asarray(emb_sel), axis=1)

    cond_h = np.linspace(0, gh, rc.num_height_queries, endpoint=False, dtype=np.float32)
    cond_w = np.linspace(0, gw, rc.num_width_queries, endpoint=False, dtype=np.float32)

    def cond_rope_fn(gt):
        return get_3d_rotary_pos_embed_v2_jnp(d, gt, jnp.asarray(cond_h), jnp.asarray(cond_w))

    vip_cond_rope = jax.vmap(cond_rope_fn)(cond_sel.astype(jnp.float32))

    return {
        "latents": latents,
        "vip_input_chunks": vip_input_chunks,
        "vip_emb_sel": jnp.asarray(emb_sel),
        "resampler_image_rotary_emb": rs_image_rope,
        "resampler_sampling_rotary_emb": rs_sampling_rope,
        "text_embeds": text_embeds,
        "image_rotary_emb": image_rope,
        "vip_image_rotary_emb": vip_image_rope,
        "vip_condition_rotary_emb": vip_cond_rope,
        "relative_start_idx": rel,
    }

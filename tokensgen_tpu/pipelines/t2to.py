"""T2To pipeline: text -> condensed-token sequence for a whole long video.

JAX re-architecture of `LongVGenCogVideoXPipeline`
(`/root/reference/longvgen/pipeline/pipeline_cogvideox_t2to.py:584-912`):

* denoises token latents [B, 4·num_chunks (<=96), 16, 8, 12] — the DiT is a 5b
  clone with patch_size=1 (`DiTConfig.t2to_5b`),
* RoPE over raw grids with per-axis dims (52, 6, 6) (`:543-564`),
* standard CFG DPM loop (shared `sampling/base.py` scan),
* post-process: un-normalise with the training std/mean (first 16 dims), zero-pad
  16 -> 3072 and lift through the fitted PCA (`:891-904`) — tokens come back as
  [B, F, 3072, 8, 12] "token frames" ready to condition To2V.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tokensgen_tpu.core import pca as pca_lib
from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
from tokensgen_tpu.sampling import base as base_sampler


@dataclasses.dataclass(frozen=True)
class T2ToConfig:
    num_frames_per_chunk: int = 4  # token frames per chunk (capped at 4, `:702-705`)
    num_inference_steps: int = 52
    guidance_scale: float = 6.0
    use_dynamic_cfg: bool = False
    token_dim: int = 3072
    latent_channels: int = 16
    height: int = 8
    width: int = 12
    rope_dims: tuple = (52, 6, 6)
    stochastic: bool = True


class T2ToPipeline:
    def __init__(
        self,
        cfg: T2ToConfig,
        dit_config: DiTConfig,
        dit_params,
        sched: Optional[S.DiffusionSchedule] = None,
        pca: Optional[pca_lib.PCAState] = None,
        token_mean: Optional[jnp.ndarray] = None,  # [1, >=16]
        token_std: Optional[jnp.ndarray] = None,
    ):
        if cfg.num_frames_per_chunk > 4:
            raise ValueError("num_frames_per_chunk must be <= 4 (static pos embeds)")
        self.cfg = cfg
        self.dit_config = dit_config
        self.dit_params = dit_params
        # T2To uses the vip_1 re-warped schedule when configured
        # (`train_cogvideo_t2to.py:1316-1317`)
        self.sched = sched or S.make_schedule(
            S.ScheduleConfig(beta_schedule="vip_1")
        )
        self.pca = pca
        self.token_mean = token_mean
        self.token_std = token_std
        self.dit = CogVideoXTransformer(dit_config)

    def rope(self, num_frames: int):
        dt, dh, dw = self.cfg.rope_dims
        return get_3d_rotary_pos_embed_v2(
            self.dit_config.attention_head_dim,
            np.arange(num_frames, dtype=np.float32),
            np.arange(self.cfg.height, dtype=np.float32),
            np.arange(self.cfg.width, dtype=np.float32),
            dim_t=dt, dim_h=dh, dim_w=dw,
        )

    def generate_tokens(
        self,
        prompt_embeds: jnp.ndarray,  # [B, 226, 4096]
        negative_embeds: jnp.ndarray,
        num_chunks: int,
        rng: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b = prompt_embeds.shape[0]
        f = num_chunks * cfg.num_frames_per_chunk
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng, key = jax.random.split(rng)
        if latents is None:
            latents = jax.random.normal(
                key, (b, f, cfg.latent_channels, cfg.height, cfg.width), jnp.float32
            )
        rope = self.rope(f)
        text_cfg = jnp.concatenate([negative_embeds, prompt_embeds])

        # params thread through model_consts as a jit ARGUMENT — closing over
        # the 11 GB full-size tree would bake it into the program as
        # constants (the remote compile helper rejects such programs)
        def model_fn(mc, lat_cfg, tvec):
            return self.dit.apply(
                mc, lat_cfg.astype(self.dit_config.dtype),
                text_cfg, tvec, image_rotary_emb=rope,
            )

        scfg = base_sampler.SamplerConfig(
            num_inference_steps=cfg.num_inference_steps,
            guidance_scale=cfg.guidance_scale,
            use_dynamic_cfg=cfg.use_dynamic_cfg,
            stochastic=cfg.stochastic,
        )
        res = base_sampler.denoise(model_fn, self.sched, scfg, latents, rng=rng,
                                   model_consts=self.dit_params)
        return res.latents

    def postprocess(self, latents: jnp.ndarray) -> jnp.ndarray:
        """16-dim normalised token latents -> [B, F, 3072, 8, 12] token frames
        (`pipeline_cogvideox_t2to.py:891-904`)."""
        cfg = self.cfg
        b, f, c, h, w = latents.shape
        flat = latents.astype(jnp.float32).transpose(0, 1, 3, 4, 2).reshape(-1, c)
        if self.token_std is not None:
            flat = flat * self.token_std[:, :c] + self.token_mean[:, :c]
        full = jnp.zeros((flat.shape[0], cfg.token_dim), jnp.float32)
        full = full.at[:, :c].set(flat)
        if self.pca is not None:
            full = pca_lib.inverse_transform(self.pca, full)
        return full.reshape(b, f, h, w, cfg.token_dim).transpose(0, 1, 4, 2, 3)

    def __call__(self, prompt_embeds, negative_embeds, num_chunks, rng=None,
                 latents=None) -> jnp.ndarray:
        toks = self.generate_tokens(prompt_embeds, negative_embeds, num_chunks, rng,
                                    latents)
        return self.postprocess(toks)


def extend_generated_tokens(image_embeddings: jnp.ndarray, num_chunks: int) -> jnp.ndarray:
    """Pad T2To tokens with repeats of the final token frame, as the To2V pipeline
    does when fed precomputed embeddings (`pipeline_cogvideox_mp_fifo.py:614-618`)."""
    reps = image_embeddings.shape[1] // num_chunks
    pad = jnp.repeat(image_embeddings[:, -1:], reps, axis=1)
    return jnp.concatenate([image_embeddings, pad], axis=1)

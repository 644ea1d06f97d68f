"""To2V pipeline: video-conditioned (VIP) long-video generation.

JAX re-architecture of `MPFIFOVideoIPAdapterCogVideoXPipeline`
(`/root/reference/longvgen/pipeline/pipeline_cogvideox_mp_fifo.py`) +
`VideoIPAdapterCogVideoXPipeline` (`pipeline_cogvideox.py`). One class covers
both reference classes: the base-clip pass, the in-process FIFO, and the
(formerly multi-process) sharded FIFO are all jitted programs here.

Stages (edit workload, `config/infer/edit.yaml`):
1. text conditioning — precomputed T5 embeddings in, CFG-batched uncond-first
   ([neg, pos] 2-way / [neg, pos, pos] 3-way, `:1015-1029`),
2. `vip_encode_video` — VAE-encode the source video (+1 repeated-last-frame
   chunk), project latent frames through the DiT's patch conv, resample each
   13-frame chunk to 4x8x12 condensed tokens; uncond = zeros video; CFG batch is
   [img, img] 2-way / [img, uncond_img, img] 3-way (`:562-648`),
3. rotary tables — base 13-frame window rope with 720x480 crop coords; VIP image
   grids over the whole video; VIP condition grids offset by
   `video_ipadapter_start_frame_idx=1000` (`:1056-1149`),
4. base-clip denoise with FIFO-seed snapshots (`sampling/base.py`),
5. FIFO long-video loop (`sampling/fifo.py`) with the extended embedding/grid
   arrays (`cogvideo_sampling_mp_fifo.py:84-108`),
6. chunked VAE decode (`:676-684`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed, get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
from tokensgen_tpu.models.vae3d import VAEConfig, VAERunner, sample_latent
from tokensgen_tpu.sampling import base as base_sampler
from tokensgen_tpu.sampling import fifo as fifo_engine


@dataclasses.dataclass(frozen=True)
class To2VConfig:
    height: int = 480
    width: int = 720
    num_frames_per_chunk: int = 49  # pixel frames
    num_inference_steps: int = 52
    guidance_scale: float = 6.0
    guidance_scale_img: float = 1.5
    use_dynamic_cfg: bool = False
    use_separate_guidance: bool = False
    vip_scale: float = 0.6  # config/infer/edit.yaml scale: [0.6]
    video_ipadapter_start_frame_idx: int = 1000
    num_partitions: int = 4
    lookahead_denoising: bool = True
    use_adaptive_padding: bool = True
    vae_scale_factor_spatial: int = 8
    vae_scale_factor_temporal: int = 4
    stochastic: bool = True
    # "xt": recycled-frame renoise via `add_noise_to_xt(t=999)` (mp_v2,
    # `cogvideo_sampling_mp_fifo.py:117-131`); "randn": pure fresh noise
    # (single-device engine, `cogvideo_sampling.py:115-128`)
    tail_renoise_mode: str = "xt"
    # False selects the DINOv2 image-encoder conditioning path (the reference's
    # `use_vae_as_encoder: false`, `infer_cogvideo_mp_fifo.py:300-320`);
    # requires the pipeline's ``image_encoder=(DINOv2Encoder, params)``
    use_vae_as_encoder: bool = True
    # dtype of the FIFO engine's stacked emitted-frame buffer; "bfloat16"
    # halves that buffer's HBM (the queue/scheduler math stays f32)
    fifo_emit_dtype: str = "float32"
    # run the CFG branches as sequential B=1 forwards instead of one batched
    # B=2/3 forward: ~half the activation HBM for ~4.5% more step time —
    # required for the FULL-DEPTH single-chip e2e on a 16 GB part
    sequential_cfg: bool = False

    @property
    def nf_latent(self) -> int:
        return (self.num_frames_per_chunk - 1) // self.vae_scale_factor_temporal + 1  # 13


def apply_patch_proj(dit_config: DiTConfig, dit_params, latents: jnp.ndarray) -> jnp.ndarray:
    """Run only the DiT's patch conv on latent frames: [B, F, C, H, W] ->
    [B, F, h*w, inner_dim] (the reference's `transformer.patch_embed.proj` reuse,
    `pipeline_cogvideox_mp_fifo.py:595-597`)."""
    p = dit_config.patch_size
    conv = nn.Conv(dit_config.inner_dim, (p, p), strides=(p, p), padding="VALID",
                   dtype=dit_config.dtype)
    b, f, c, h, w = latents.shape
    x = latents.astype(dit_config.dtype).reshape(b * f, c, h, w).transpose(0, 2, 3, 1)
    y = conv.apply({"params": dit_params["patch_proj"]}, x)
    return y.reshape(b, f, (h // p) * (w // p), dit_config.inner_dim)


class To2VPipeline:
    """Bundles params + configs; every compute stage is a jitted pure function."""

    def __init__(
        self,
        cfg: To2VConfig,
        dit_config: DiTConfig,
        dit_params,
        resampler_config: ResamplerConfig,
        resampler_params,
        vae_runner: Optional[VAERunner],
        sched: Optional[S.DiffusionSchedule] = None,
        pca=None,
        image_encoder=None,  # optional (DINOv2Encoder, params) for the non-VAE path
    ):
        if cfg.num_frames_per_chunk > 49:
            raise ValueError(
                "num_frames_per_chunk must be <= 49 (static positional embeddings; "
                "`pipeline_cogvideox.py:933-936`)"
            )
        self.cfg = cfg
        self.dit_config = dit_config
        self.dit_params = dit_params
        self.resampler_config = resampler_config
        self.resampler_params = resampler_params
        self.vae = vae_runner
        self.sched = sched or S.make_schedule(S.ScheduleConfig())
        self.pca = pca
        self.image_encoder = image_encoder
        self.dit = CogVideoXTransformer(dit_config)
        self.resampler = Resampler(resampler_config)
        # tiny standalone copy of the DiT's patch conv so the VIP-encode phase
        # never needs the full 14 GB dit_params resident (single-chip offload)
        self._patch_proj = None
        # persistent HOST masters for the offload orchestration: params never
        # mutate during inference, so after ONE initial D2H copy every later
        # phase move is either a free rebind (offload) or an H2D upload
        # (restore) — never a repeat D2H of the 14.3 GB DiT tree. (Through the
        # axon tunnel D2H runs at 0.02 GB/s vs 0.12 H2D; on a real host the
        # saving is simply half the PCIe traffic.)
        self._dit_params_host = None
        self._resampler_params_host = None
        if dit_params is not None and "patch_proj" in dit_params.get("params", {}):
            self._patch_proj = {"patch_proj": dit_params["params"]["patch_proj"]}

        c = cfg
        self.grid_h = c.height // (c.vae_scale_factor_spatial * dit_config.patch_size)
        self.grid_w = c.width // (c.vae_scale_factor_spatial * dit_config.patch_size)

    # ------------------------------------------------------------------ ropes

    def base_image_rope(self):
        nf = self.cfg.nf_latent
        crops = ([0, 0, 0], [nf, self.grid_h, self.grid_w])
        return get_3d_rotary_pos_embed(
            self.dit_config.attention_head_dim, crops, (nf, self.grid_h, self.grid_w)
        )

    def vip_grids(self, num_chunks: int):
        """Host-side grid arrays (`pipeline_cogvideox_mp_fifo.py:1061-1103`)."""
        rc = self.resampler_config
        nf = self.cfg.nf_latent
        off = self.cfg.video_ipadapter_start_frame_idx
        img_t = np.arange(num_chunks * nf, dtype=np.float32)
        img_h = np.arange(self.grid_h, dtype=np.float32)
        img_w = np.arange(self.grid_w, dtype=np.float32)
        cond_t = np.concatenate([
            np.linspace(off + i * nf, off + (i + 1) * nf, rc.num_temporal_queries,
                        endpoint=False, dtype=np.float32)
            for i in range(num_chunks + 1)
        ])
        cond_h = np.linspace(0, self.grid_h, rc.num_height_queries, endpoint=False,
                             dtype=np.float32)
        cond_w = np.linspace(0, self.grid_w, rc.num_width_queries, endpoint=False,
                             dtype=np.float32)
        return img_t, img_h, img_w, cond_t, cond_h, cond_w

    def resampler_ropes(self):
        rc = self.resampler_config
        d = self.dit_config.attention_head_dim
        nf = self.cfg.nf_latent
        off = self.cfg.video_ipadapter_start_frame_idx
        image = get_3d_rotary_pos_embed_v2(
            d, np.arange(nf, dtype=np.float32),
            np.arange(self.grid_h, dtype=np.float32),
            np.arange(self.grid_w, dtype=np.float32),
        )
        sampling = get_3d_rotary_pos_embed_v2(
            d,
            np.linspace(off, off + nf, rc.num_temporal_queries, endpoint=False, dtype=np.float32),
            np.linspace(0, self.grid_h, rc.num_height_queries, endpoint=False, dtype=np.float32),
            np.linspace(0, self.grid_w, rc.num_width_queries, endpoint=False, dtype=np.float32),
        )
        return image, sampling

    # ------------------------------------------------------- vip conditioning

    def vip_encode_video(
        self,
        frames: jnp.ndarray,  # [B, F_px, H, W, 3] in [-1, 1]
        rng: Optional[jax.Array] = None,
        do_cfg: bool = True,
    ) -> jnp.ndarray:
        """-> CFG-batched condensed tokens [nB, 4*(chunks+1), Cv, 8, 12]."""
        cfg = self.cfg
        nf_px = cfg.num_frames_per_chunk
        b, f_px = frames.shape[0], frames.shape[1]
        num_chunks = f_px // nf_px
        # pad one chunk of repeated last frame (`:580-582`). When the caller
        # passes a host numpy array, padding/slicing stays host-side and only
        # one 49-frame chunk at a time ever lands in HBM (a 98-frame 720x480
        # source is ~200 MB — real headroom during the single-chip e2e)
        xp = np if isinstance(frames, np.ndarray) else jnp
        pad = xp.repeat(frames[:, -1:], nf_px, axis=1)
        video = xp.concatenate([frames, pad], axis=1)

        img_rope, smp_rope = self.resampler_ropes()

        def encode_chunks(video):
            toks = []
            for cid in range(video.shape[1] // nf_px):
                chunk = video[:, cid * nf_px:(cid + 1) * nf_px]
                moments = self.vae.encode(chunk)
                key = None if rng is None else jax.random.fold_in(rng, cid)
                lat = sample_latent(moments, key) * self.vae.config.scaling_factor
                lat = lat.transpose(0, 1, 4, 2, 3)  # [B, f, C, h, w]
                tokens = apply_patch_proj(self.dit_config, self._patch_proj, lat)
                toks.append(self.resampler.apply(
                    self.resampler_params, tokens, img_rope, smp_rope, pca=self.pca,
                ))
            return jnp.concatenate(toks, axis=1)

        cond = encode_chunks(video)
        from tokensgen_tpu.utils.debug import stats

        cond = stats("image_embeddings", cond)  # (`:1174-1175` print parity)
        if not do_cfg:
            return cond
        uncond = encode_chunks(jnp.zeros_like(video))
        if cfg.use_separate_guidance:
            return jnp.concatenate([cond, uncond, cond], axis=0)
        return jnp.concatenate([cond, cond], axis=0)

    def encode_image_features(
        self,
        frame_features: jnp.ndarray,  # [B, F_px, N, E] per-frame features
        do_cfg: bool = True,
        uncond_features: Optional[jnp.ndarray] = None,
        feature_grid: Optional[tuple] = None,  # (gh, gw) with gh*gw == N
    ) -> jnp.ndarray:
        """Image-encoder conditioning path (`use_vae_as_encoder: false`):
        per-frame features from an external vision encoder (the reference uses
        DINOv2 penultimate hidden states, 256 tokens/frame,
        `pipeline_cogvideox_mp_fifo.py:488-560`) resampled per pixel-frame chunk.
        The encoder itself is pluggable — pass its features in; CFG uncond
        defaults to zero features.

        Unlike the VAE path, the resampler ropes cover the PIXEL-frame x
        encoder-patch grid (the reference builds them from the resampler's
        max_*_seq_len, `pipeline_cogvideox_mp_fifo.py:1104-1149`); square
        ``N`` is inferred, otherwise pass ``feature_grid``."""
        nf_px = self.cfg.num_frames_per_chunk
        n = frame_features.shape[2]
        if feature_grid is None:
            g = int(round(n ** 0.5))
            if g * g != n:
                raise ValueError(f"non-square N={n}: pass feature_grid=(gh, gw)")
            feature_grid = (g, g)
        gh, gw = feature_grid
        rc = self.resampler_config
        d = self.dit_config.attention_head_dim
        off = self.cfg.video_ipadapter_start_frame_idx
        img_rope = get_3d_rotary_pos_embed_v2(
            d, np.arange(nf_px, dtype=np.float32),
            np.arange(gh, dtype=np.float32), np.arange(gw, dtype=np.float32))
        smp_rope = get_3d_rotary_pos_embed_v2(
            d,
            np.linspace(off, off + nf_px, rc.num_temporal_queries,
                        endpoint=False, dtype=np.float32),
            np.linspace(0, gh, rc.num_height_queries, endpoint=False, dtype=np.float32),
            np.linspace(0, gw, rc.num_width_queries, endpoint=False, dtype=np.float32))

        def resample(feats):
            toks = []
            for cid in range(feats.shape[1] // nf_px):
                toks.append(self.resampler.apply(
                    self.resampler_params,
                    feats[:, cid * nf_px:(cid + 1) * nf_px],
                    img_rope, smp_rope, pca=self.pca,
                ))
            return jnp.concatenate(toks, axis=1)

        cond = resample(frame_features)
        if not do_cfg:
            return cond
        if uncond_features is None:
            uncond_features = jnp.zeros_like(frame_features)
        uncond = resample(uncond_features)
        if self.cfg.use_separate_guidance:
            return jnp.concatenate([cond, uncond, cond], axis=0)
        return jnp.concatenate([uncond, cond], axis=0)

    def encode_image_dinov2(
        self,
        frames: jnp.ndarray,  # [B, F_px, H, W, 3] in [-1, 1]
        do_cfg: bool = True,
        num_tokens: Optional[int] = None,
    ) -> jnp.ndarray:
        """Full DINOv2 conditioning path (`use_vae_as_encoder: false`,
        `pipeline_cogvideox_mp_fifo.py:488-560`): antialiased 224 resize +
        ImageNet normalise, penultimate hidden state, first ``num_tokens``
        tokens per frame, resampled per chunk. The CFG uncond branch encodes
        ZERO IMAGES through the encoder (`:538-540`), not zero features.
        Requires ``image_encoder=(DINOv2Encoder, params)`` on the pipeline."""
        if self.image_encoder is None:
            raise ValueError("pipeline built without image_encoder")
        from tokensgen_tpu.models.dinov2 import preprocess_frames

        enc, enc_params = self.image_encoder
        if num_tokens is None:
            # the reference's [:, :256] at DINOv2-large/224 keeps cls + the
            # first num_patches-1 patches; num_patches generalises that slice
            num_tokens = enc.config.num_patches
        b, f = frames.shape[:2]
        px = preprocess_frames(
            frames.reshape((b * f,) + frames.shape[2:]), enc.config.image_size)

        def features(images):
            h = enc.apply(enc_params, images)[:, :num_tokens]
            return h.reshape(b, f, *h.shape[1:])

        uncond = features(jnp.zeros_like(px)) if do_cfg else None
        return self.encode_image_features(features(px), do_cfg,
                                          uncond_features=uncond)

    # --------------------------------------------------------------- model fn

    def _model_fn(self, text_embeds_cfg: jnp.ndarray, image_rotary_emb):
        """Closure for the samplers: (params, lat_cfg, t2d, vip_kwargs) -> pred."""
        dit, cfg = self.dit, self.cfg

        def one_forward(params, lat, text, t2d, vip_kwargs):
            kw = {}
            if vip_kwargs is not None:
                kw = dict(
                    vip_hidden_states=vip_kwargs["vip_hidden_states"],
                    vip_image_rotary_emb=vip_kwargs["vip_image_rotary_emb"],
                    vip_condition_rotary_emb=vip_kwargs["vip_condition_rotary_emb"],
                )
            return dit.apply(
                params, lat.astype(self.dit_config.dtype), text, t2d,
                image_rotary_emb=image_rotary_emb,
                vip_scale=jnp.asarray(cfg.vip_scale),
                **kw,
            )

        def model_fn(params, lat_cfg, t2d, vip_kwargs):
            nb = lat_cfg.shape[0]
            if not cfg.sequential_cfg or nb == 1:
                return one_forward(params, lat_cfg, text_embeds_cfg, t2d,
                                   vip_kwargs)
            # sequential CFG: one B=1 forward per guidance branch via lax.map.
            # map (not an unrolled Python loop!) forces true serialization so
            # XLA reuses one forward's activation buffers across branches —
            # an unrolled loop's independent forwards get interleaved by the
            # latency-hiding scheduler and CO-RESIDENT buffers defeat the
            # point. Halves the activation HBM of the batched forward (the
            # difference between the full-depth single-chip run fitting a
            # 16 GB part or not) for ~4.5% more step time.
            if vip_kwargs is None:
                def one(args):
                    lat, text, t_ = args
                    return one_forward(params, lat[None], text[None],
                                       t_[None], None)[0]

                return jax.lax.map(one, (lat_cfg, text_embeds_cfg, t2d))

            def one_vip(args):
                lat, text, t_, vh = args
                vk = dict(vip_kwargs)
                vk["vip_hidden_states"] = vh[None]
                return one_forward(params, lat[None], text[None], t_[None],
                                   vk)[0]

            return jax.lax.map(
                one_vip, (lat_cfg, text_embeds_cfg, t2d,
                          vip_kwargs["vip_hidden_states"]))

        return model_fn

    def cfg_text(self, prompt_embeds: jnp.ndarray, negative_embeds: jnp.ndarray):
        if self.cfg.use_separate_guidance:
            return jnp.concatenate([negative_embeds, prompt_embeds, prompt_embeds])
        return jnp.concatenate([negative_embeds, prompt_embeds])

    # -------------------------------------------------------------- base pass

    def base_denoise(
        self,
        prompt_embeds: jnp.ndarray,  # [B, 226, 4096]
        negative_embeds: jnp.ndarray,
        image_embeddings: Optional[jnp.ndarray],  # vip tokens (CFG-batched) or None
        num_chunks: int,
        rng: jax.Array,
        latents: Optional[jnp.ndarray] = None,
        host_loop: bool = False,
    ):
        """Denoise the base clip (chunk 0) and return (result, seed ingredients)."""
        cfg = self.cfg
        nf = cfg.nf_latent
        b = prompt_embeds.shape[0]
        h_lat = cfg.height // cfg.vae_scale_factor_spatial
        w_lat = cfg.width // cfg.vae_scale_factor_spatial
        if latents is None:
            rng, key = jax.random.split(rng)
            latents = jax.random.normal(key, (b, nf, 16, h_lat, w_lat), jnp.float32)

        image_rope = self.base_image_rope()
        text_cfg = self.cfg_text(prompt_embeds, negative_embeds)
        model_fn = self._model_fn(text_cfg, image_rope)
        use_vip = image_embeddings is not None

        vip_kwargs = None
        if use_vip:
            img_t, img_h, img_w, cond_t, cond_h, cond_w = self.vip_grids(num_chunks)
            d = self.dit_config.attention_head_dim
            rc = self.resampler_config
            n_vip = min(rc.num_temporal_queries + 1, nf)
            vip_img_rope = get_3d_rotary_pos_embed_v2(d, img_t[:nf], img_h, img_w)
            vip_cond_rope = get_3d_rotary_pos_embed_v2(d, cond_t[:n_vip], cond_h, cond_w)
            vip_kwargs = {
                "vip_hidden_states": image_embeddings[:, :n_vip],
                "vip_image_rotary_emb": vip_img_rope,
                "vip_condition_rotary_emb": vip_cond_rope,
            }

        def base_model(mc, lat_cfg, tvec):
            t2d = jnp.broadcast_to(tvec[:, None], (lat_cfg.shape[0], lat_cfg.shape[1]))
            return model_fn(mc, lat_cfg, t2d, vip_kwargs)

        scfg = base_sampler.SamplerConfig(
            num_inference_steps=cfg.num_inference_steps,
            guidance_scale=cfg.guidance_scale,
            guidance_scale_img=cfg.guidance_scale_img,
            use_dynamic_cfg=cfg.use_dynamic_cfg,
            use_separate_guidance=cfg.use_separate_guidance,
            collect_fifo=True,
            stochastic=cfg.stochastic,
        )
        res = base_sampler.denoise(
            base_model, self.sched, scfg, latents, rng=rng,
            host_loop=host_loop,
            model_consts={"params": self.dit_params["params"]})
        return res, image_rope, model_fn

    # -------------------------------------------------------------- fifo pass

    def fifo_seed(self, res, image_rope, image_embeddings, num_chunks: int):
        """Assemble the engine's seed: extended grids + embeddings
        (`cogvideo_sampling_mp_fifo.py:84-108,148-173`)."""
        cfg = self.cfg
        nf = cfg.nf_latent
        steps = cfg.num_inference_steps
        r_nf = nf // 2
        num_frames = num_chunks * nf
        num_iters = num_frames + steps - nf
        ts = S.inference_timesteps(self.sched.config, steps)

        vip_state = None
        if image_embeddings is not None:
            img_t, img_h, img_w, cond_t, cond_h, cond_w = self.vip_grids(num_chunks)
            rc = self.resampler_config
            vq = rc.num_temporal_queries
            initial = np.concatenate([
                np.full(r_nf + steps - nf, img_t[0], dtype=np.float32), img_t[:nf]
            ])
            queue = np.concatenate([
                img_t[nf:],
                np.linspace(img_t[-1] + 1, img_t[-1] + 1 + steps, steps,
                            endpoint=False, dtype=np.float32),
            ])
            g_full = np.concatenate([initial, queue])
            queue_len = r_nf + steps
            assert len(g_full) == queue_len + num_iters, (len(g_full), num_iters)
            n_ext = steps // nf + 1
            cond_ext = np.concatenate(
                [cond_t] + [cond_t[-vq:] + (i + 1) * nf for i in range(n_ext)]
            )
            emb_ext = jnp.concatenate(
                [image_embeddings]
                + [image_embeddings[:, -vq:]] * n_ext, axis=1
            )
            vip_state = fifo_engine.VIPState(
                image_embeddings=emb_ext,
                image_grid_t_full=jnp.asarray(g_full),
                condition_grid_t=jnp.asarray(cond_ext),
                image_grid_h=img_h, image_grid_w=img_w,
                condition_grid_h=cond_h, condition_grid_w=cond_w,
                vip_nf_per_chunk=vq,
            )

        return fifo_engine.FIFOSeed(
            fifo_latents=res.fifo_latents,
            fifo_old_x0=res.fifo_old_x0,
            fifo_old_valid=res.fifo_old_valid,
            timesteps=ts,
            image_rotary_emb=image_rope,
            vip=vip_state,
        )

    def generate(
        self,
        prompt_embeds: jnp.ndarray,
        negative_embeds: jnp.ndarray,
        frames: Optional[jnp.ndarray] = None,  # source video for editing
        image_embeddings: Optional[jnp.ndarray] = None,  # or precomputed tokens
        num_chunks: int = 4,
        rng: Optional[jax.Array] = None,
        mesh=None,
        cache_idx: Tuple[int, ...] = (),
        decode: bool = True,
        offload_vae: bool = False,
        host_loop: bool = False,
        emit_callback=None,
        state_callback=None,
        resume_from=None,
        skip_fifo: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Full edit/generation run: base pass -> FIFO -> (optional) decode.

        ``skip_fifo``: stop after the base N-step denoise (returns
        ``orig_latents``/``orig_video`` only) — used by numerics studies that
        probe the plain multi-step denoise without the FIFO stage.

        ``offload_vae``: park the VAE params in host memory during the denoise
        phase (restored before decoding) — the production To2V stack's params
        (DiT 14.3 GB + VAE + resampler ~ 15.5 GB bf16) only share one 16 GB
        chip with this enabled.

        ``host_loop``: drive both denoise phases one jitted step at a time
        from the host (identical numerics to the lax.scan programs) — bounds
        single-execution wall time on capped runtimes and gives per-step
        progress."""
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng, r_vip, r_base, r_fifo = jax.random.split(rng, 4)

        if host_loop and not offload_vae:
            # host-loop runs dispatch one jitted program per step with the
            # params as an ARGUMENT; if the DiT tree still lives on a host CPU
            # device (e.g. a freshly built master), every dispatch would
            # re-upload the full tree — on tunneled runtimes the client's
            # serialized buffers then OOM the host long before the run ends.
            # Land the tree on the compute device once.
            leaves = jax.tree_util.tree_leaves(self.dit_params)
            devs = getattr(leaves[0], "devices", lambda: set())() if leaves else set()
            dev = next(iter(devs), None)
            if (jax.default_backend() != "cpu" and dev is not None
                    and dev.platform == "cpu"):
                self.dit_params = jax.device_put(
                    self.dit_params, jax.devices()[0])

        if offload_vae and frames is not None and image_embeddings is None:
            # phase orchestration for one 16 GB chip: the production stack's
            # params alone are 15.5 GB (DiT 14.3 + resampler 0.6 + VAE 0.4),
            # so encode, denoise and decode each get only the modules they
            # use. The encode phase needs just the VAE + resampler + the tiny
            # patch-proj copy — the full DiT waits in host memory. (Restore
            # VAE/resampler first: a previous offload run ends with them on
            # host — see the tail of this method.)
            dev0 = jax.devices()[0]
            if self._dit_params_host is None:
                self._dit_params_host = jax.device_put(
                    self.dit_params, jax.devices("cpu")[0])
            self.dit_params = self._dit_params_host
            if self.vae is not None:
                self.vae.restore_to_device(dev0)
            if self._resampler_params_host is None:
                self._resampler_params_host = jax.device_put(
                    self.resampler_params, jax.devices("cpu")[0])
            self.resampler_params = jax.device_put(
                self._resampler_params_host, dev0)
        if image_embeddings is None and frames is not None:
            if cfg.use_vae_as_encoder:
                image_embeddings = self.vip_encode_video(frames, rng=r_vip)
            else:
                # `use_vae_as_encoder: false`: DINOv2 conditioning path
                # (`pipeline_cogvideox_mp_fifo.py:488-560`)
                image_embeddings = self.encode_image_dinov2(frames)
        if offload_vae:
            if image_embeddings is not None:
                jax.block_until_ready(image_embeddings)
            dev = jax.devices()[0]
            if self.vae is not None:
                self.vae.offload_to_host()
            if self._resampler_params_host is not None:
                self.resampler_params = self._resampler_params_host
            else:
                self.resampler_params = jax.device_put(
                    self.resampler_params, jax.devices("cpu")[0])
            src = (self._dit_params_host if self._dit_params_host is not None
                   else self.dit_params)
            self.dit_params = jax.device_put(src, dev)

        res, image_rope, model_fn = self.base_denoise(
            prompt_embeds, negative_embeds, image_embeddings, num_chunks, r_base,
            host_loop=host_loop,
        )
        if skip_fifo:
            out = {"orig_latents": res.latents}
            if decode and self.vae is not None:
                if offload_vae:
                    jax.block_until_ready(res.latents)
                    self.dit_params = self._dit_params_host
                    self.vae.restore_to_device()
                    self.resampler_params = jax.device_put(
                        self._resampler_params_host, jax.devices()[0])
                out["orig_video"] = self.decode_latents(res.latents)
            return out
        seed = self.fifo_seed(res, image_rope, image_embeddings, num_chunks)
        orig_latents = res.latents
        if host_loop and mesh is None:
            # single-chip host-loop runs sit within MBs of the HBM edge with
            # the full DiT resident: land the base-pass latents now (the seed
            # already holds what FIFO needs) instead of keeping a live device
            # buffer through ~n_iters dispatches and transferring it after —
            # the post-FIFO transfer is exactly what OOM'd at full depth.
            orig_latents = np.asarray(orig_latents)
            res = None

        fcfg = fifo_engine.FIFOConfig(
            nf_per_chunk=cfg.nf_latent,
            num_partitions=cfg.num_partitions,
            num_inference_steps=cfg.num_inference_steps,
            num_frames=num_chunks * cfg.nf_latent,
            lookahead_denoising=cfg.lookahead_denoising,
            use_adaptive_padding=cfg.use_adaptive_padding,
            guidance_scale=cfg.guidance_scale,
            guidance_scale_img=cfg.guidance_scale_img,
            use_dynamic_cfg=cfg.use_dynamic_cfg,
            use_separate_guidance=cfg.use_separate_guidance,
            stochastic=cfg.stochastic,
            tail_renoise_mode=cfg.tail_renoise_mode,
            emit_dtype=cfg.fifo_emit_dtype,
            video_ipadapter_start_frame_idx=cfg.video_ipadapter_start_frame_idx,
            vip_rope_dims=(
                self.dit_config.attention_head_dim // 4,
                self.dit_config.attention_head_dim // 8 * 3,
                self.dit_config.attention_head_dim // 8 * 3,
            ),
        )
        fifo_res = fifo_engine.fifo_generate(
            model_fn, {"params": self.dit_params["params"]}, self.sched, fcfg, seed,
            rng=r_fifo, cache_idx=cache_idx, mesh=mesh, host_loop=host_loop,
            emit_callback=emit_callback, state_callback=state_callback,
            resume_from=resume_from,
        )

        out = {
            "latents": fifo_res.latents,
            "orig_latents": orig_latents,
            "cache_x0": fifo_res.cache_x0,
            "cache_valid": fifo_res.cache_valid,
        }
        if decode and self.vae is not None:
            if offload_vae:
                # decode phase: DiT back to host (free: rebind the master,
                # the device buffers drop with their last reference), VAE
                # back on device
                jax.block_until_ready(fifo_res.latents)
                if res is not None:
                    jax.block_until_ready(orig_latents)
                self.dit_params = self._dit_params_host
                self.vae.restore_to_device()
                self.resampler_params = jax.device_put(
                    self._resampler_params_host, jax.devices()[0])
            out["video"] = self.decode_latents(fifo_res.latents)
            out["orig_video"] = self.decode_latents(jnp.asarray(orig_latents))
            if fifo_res.cache_x0 is not None:
                # cache tracks: one output frame's x0 across its denoise
                # trajectory, decoded as a video (`infer_cogvideo_mp_fifo.py:
                # 369-385`); truncated to whole decode chunks
                nf = cfg.nf_latent
                cache_videos = []
                for c in range(fifo_res.cache_x0.shape[0]):
                    valid = np.asarray(fifo_res.cache_valid[c])
                    track = fifo_res.cache_x0[c][valid]  # [T, B, C, H, W]
                    track = track.transpose(1, 0, 2, 3, 4)
                    t_use = (track.shape[1] // nf) * nf
                    if t_use == 0:
                        continue
                    cache_videos.append(self.decode_latents(track[:, :t_use]))
                out["cache_videos"] = cache_videos
        if offload_vae:
            # leave the pipeline in the denoise-phase placement (DiT on
            # device, VAE/resampler on host): a subsequent base_denoise /
            # generate works, and the next generate(offload_vae=True) run
            # restores the VAE itself at its encode phase. Without this, the
            # decode phase would silently park the 14 GB DiT on host for any
            # later call.
            for v in out.values():
                jax.block_until_ready(v)
            if self.vae is not None:
                self.vae.offload_to_host()
            if self._resampler_params_host is not None:
                self.resampler_params = self._resampler_params_host
            # only re-upload the DiT if the decode phase parked it on host;
            # when decode=False it never left the chip, and device_put-ing the
            # host master FIRST would double-book ~14.3 GB of HBM (the old
            # tree is only dropped by the assignment) — that exact epilogue
            # OOM'd the 42-layer drift run after all 65 FIFO iterations
            if self.dit_params is self._dit_params_host:
                self.dit_params = jax.device_put(
                    self._dit_params_host, jax.devices()[0])
        return out

    # ----------------------------------------------- alternate sampling modes

    def denoise_together(
        self,
        prompt_embeds: jnp.ndarray,
        negative_embeds: jnp.ndarray,
        image_embeddings: Optional[jnp.ndarray],
        num_chunks: int,
        rng: Optional[jax.Array] = None,
        latents: Optional[jnp.ndarray] = None,
        freeinit_iters: int = 0,
    ) -> jnp.ndarray:
        """`sampling_mode: denoising_together` — denoise all chunks jointly: each
        step runs the DiT once per chunk (per-chunk VIP slices/grids) and steps
        the whole multi-chunk latent at once (the base pipeline's chunk loop with
        `num_chunks_wo_fifo = num_chunks`, `pipeline_cogvideox.py:919-920,1264`).
        ``freeinit_iters > 0`` adds FreeInit frequency re-initialisation passes
        (`sampling_mode: fifo_freeinit` analogue)."""
        cfg = self.cfg
        nf = cfg.nf_latent
        b = prompt_embeds.shape[0]
        h_lat = cfg.height // cfg.vae_scale_factor_spatial
        w_lat = cfg.width // cfg.vae_scale_factor_spatial
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng, key = jax.random.split(rng)
        if latents is None:
            latents = jax.random.normal(
                key, (b, nf * num_chunks, 16, h_lat, w_lat), jnp.float32)

        image_rope = self.base_image_rope()
        text_cfg = self.cfg_text(prompt_embeds, negative_embeds)
        model_fn = self._model_fn(text_cfg, image_rope)
        use_vip = image_embeddings is not None
        d = self.dit_config.attention_head_dim
        rc = self.resampler_config
        n_vip = min(rc.num_temporal_queries + 1, nf)

        chunk_vip_kwargs = []
        if use_vip:
            img_t, img_h, img_w, cond_t, cond_h, cond_w = self.vip_grids(num_chunks)
            for cid in range(num_chunks):
                vi = get_3d_rotary_pos_embed_v2(
                    d, img_t[cid * nf:(cid + 1) * nf], img_h, img_w)
                vq = rc.num_temporal_queries
                cond_slice = cond_t[cid * vq: cid * vq + n_vip]
                vc_rope = get_3d_rotary_pos_embed_v2(d, cond_slice, cond_h, cond_w)
                chunk_vip_kwargs.append({
                    "vip_hidden_states": image_embeddings[:, cid * vq: cid * vq + n_vip],
                    "vip_image_rotary_emb": vi,
                    "vip_condition_rotary_emb": vc_rope,
                })

        def joint_model(lat_cfg, tvec):
            preds = []
            for cid in range(num_chunks):
                chunk = lat_cfg[:, cid * nf:(cid + 1) * nf]
                t2d = jnp.broadcast_to(tvec[:, None], (chunk.shape[0], nf))
                preds.append(model_fn(
                    {"params": self.dit_params["params"]}, chunk, t2d,
                    chunk_vip_kwargs[cid] if use_vip else None,
                ))
            return jnp.concatenate(preds, axis=1)

        scfg = base_sampler.SamplerConfig(
            num_inference_steps=cfg.num_inference_steps,
            guidance_scale=cfg.guidance_scale,
            guidance_scale_img=cfg.guidance_scale_img,
            use_dynamic_cfg=cfg.use_dynamic_cfg,
            use_separate_guidance=cfg.use_separate_guidance,
            stochastic=cfg.stochastic,
        )

        if freeinit_iters <= 0:
            return base_sampler.denoise(joint_model, self.sched, scfg, latents,
                                        rng=rng).latents

        from tokensgen_tpu.sampling.freeinit import freeinit_refine

        t_max = int(S.inference_timesteps(self.sched.config, cfg.num_inference_steps)[0])

        def denoise_fn(lat, r):
            return base_sampler.denoise(joint_model, self.sched, scfg, lat, rng=r).latents

        def add_noise_fn(clean, noise):
            t = jnp.full((clean.shape[0],), t_max)
            return S.add_noise(self.sched, clean, noise, t)

        return freeinit_refine(denoise_fn, add_noise_fn, latents, rng,
                               num_iters=freeinit_iters)

    def decode_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Chunked decode (`:676-684`): [B, F, C, h, w] -> [B, F_px, H, W, 3]."""
        nf = self.cfg.nf_latent
        z = latents / self.vae.config.scaling_factor
        z = z.transpose(0, 1, 3, 4, 2)  # channels-last for the VAE
        total = z.shape[1]
        if total == 0:
            raise ValueError("decode_latents: empty latent sequence")
        outs = []
        for start in range(0, total, nf):
            # a short tail chunk (total not a multiple of nf) decodes fine —
            # the causal VAE accepts any frame count; dropping it would
            # silently truncate the video
            outs.append(self.vae.decode(z[:, start:min(start + nf, total)]))
        return jnp.concatenate(outs, axis=1)

"""Inference CLI: long-video editing / generation with FIFO diagonal denoising.

TPU-native counterpart of `python infer_cogvideo_mp_fifo.py --config
config/infer/{edit,gen}.yaml` (`/root/reference/infer_cogvideo_mp_fifo.py`):
instead of one pipeline replica per GPU + mp.Queue fan-out, a single SPMD program
shards the FIFO queue-partition axis over the mesh.

Per input item (`input_config`):
* edit: `video:` given -> load + VIP-encode the source video, regenerate with a
  new prompt (`config/infer/edit.yaml` semantics),
* gen: `use_2nd_stage: true` -> T2To generates the condensed tokens from text,
  To2V renders them (`config/infer/gen.yaml` semantics).

Outputs per item: source/orig/fifo MP4s + token arrays, as the reference exports
(`infer_cogvideo_mp_fifo.py:351-380`).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _load_converted(cfg, name):
    """`converted_weights_dir`: a directory of `convert_weights.py` outputs
    (`{to2v_dit,t2to_dit,resampler,vae,t5}.safetensors`, our param layout).
    Returns the param tree for `name` or None when absent/unconfigured."""
    conv_dir = cfg.get("converted_weights_dir")
    if not conv_dir:
        return None
    path = os.path.join(conv_dir, name + ".safetensors")
    if not os.path.isfile(path):
        return None
    from tokensgen_tpu.convert.safetensors_io import load_param_tree

    tree = load_param_tree(path)
    print(f"loaded converted {name} weights from {path}", flush=True)
    return tree


def build_pipeline(cfg, smoke: bool):
    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.core import schedule as S
    from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig, VIPConfig, graft_vip_params
    from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
    from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner
    from tokensgen_tpu.pipelines.to2v import To2VConfig, To2VPipeline

    vp = cfg.get("video_ipadapter_params", {})
    rp = vp.get("resampler_params", {})
    if smoke:
        vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=2,
                       num_width_queries=3, length=3 * 2 * 3)
        dcfg = DiTConfig.tiny(vip=vc, sample_height=4, sample_width=6,
                              quant=cfg.get("quant") or None,
                              quant_attn=cfg.get("quant_attn", False),
                              fuse_qkv=cfg.get("fuse_qkv", True))
        rcfg = ResamplerConfig.tiny(embedding_dim=dcfg.inner_dim, output_dim=24,
                                    num_temporal_queries=2, num_height_queries=2,
                                    num_width_queries=3)
        vcfg = VAEConfig.tiny(sample_height=32, sample_width=48)
        pcfg = To2VConfig(height=32, width=48, num_frames_per_chunk=9,
                          num_inference_steps=6, num_partitions=2,
                          vip_scale=(vp.get("scale") or [1.0])[0],
                          use_vae_as_encoder=cfg.get("use_vae_as_encoder", True))
    else:
        vc = VIPConfig(
            length=vp.get("length", 480),
            scale=(vp.get("scale") or [1.0])[0],
            output_dim=rp.get("output_dim", 3072),
            num_temporal_queries=rp.get("num_temporal_queries", 4),
            num_height_queries=rp.get("num_height_queries", 8),
            num_width_queries=rp.get("num_width_queries", 12),
        )
        # ff_chunks=4: the CFG-batched (B=2) 7.17B forward only fits a 16 GB
        # chip with the joint-FF gelu intermediate capped (identical math)
        # fuse_qkv=True: identical math, ~6% faster step (PERF.md round 3)
        # quant_attn: int8 score matmul in the flash kernel — measured 1.04x
        # on attention with ~2x the bf16 kernel's output noise; off by default
        # even under quant=w8a8 (PERF.md round 3)
        dcfg = DiTConfig.cogvideox_5b(vip=vc, ff_chunks=4,
                                      quant=cfg.get("quant") or None,
                                      quant_attn=cfg.get("quant_attn", False),
                                      fuse_qkv=cfg.get("fuse_qkv", True))
        rcfg = ResamplerConfig(**{k: v for k, v in rp.items()
                                  if k in ResamplerConfig.__dataclass_fields__})
        vcfg = VAEConfig.cogvideox()
        pcfg = To2VConfig(
            num_inference_steps=cfg.get("num_inference_steps", 52),
            num_frames_per_chunk=cfg.get("num_frames_per_chunk", 49),
            guidance_scale=cfg.get("guidance_scale", 6.0),
            guidance_scale_img=cfg.get("guidance_scale_img", 1.5),
            use_separate_guidance=cfg.get("use_separate_guidance", False),
            num_partitions=cfg.get_path("sampling_params.num_partitions", 4),
            lookahead_denoising=cfg.get_path("sampling_params.lookahead_denoising", True),
            use_adaptive_padding=cfg.get_path("sampling_params.use_adaptive_padding", True),
            vip_scale=(vp.get("scale") or [1.0])[0],
            use_vae_as_encoder=cfg.get("use_vae_as_encoder", True),
        )

    rng = jax.random.PRNGKey(cfg.get("seed", 42))
    r1, r2, r3 = jax.random.split(rng, 3)

    # weights: converted checkpoints when configured, random init otherwise
    ckpt = cfg.get("pretrained_model_name_or_path")
    vae_model = AutoencoderKLCogVideoX(vcfg)
    vae_tree = _load_converted(cfg, "vae")
    if vae_tree is not None:
        vae_params = {"params": vae_tree}
    else:
        vae_params = vae_model.init(
            r1, jnp.zeros((1, pcfg.num_frames_per_chunk, pcfg.height, pcfg.width, 3)))
    vae = VAERunner(vcfg, vae_params, use_tiling=not smoke)

    rs = Resampler(rcfg)
    hp = pcfg.height // 8 // dcfg.patch_size
    wp = pcfg.width // 8 // dcfg.patch_size
    rs_tree = _load_converted(cfg, "resampler")
    if rs_tree is not None:
        rs_params = {"params": rs_tree}
    else:
        rs_params = rs.init(
            r2, jnp.zeros((1, pcfg.nf_latent, hp * wp, rcfg.embedding_dim)))

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    d = dcfg.attention_head_dim
    # init / checkpoint-convert / graft run on the full-precision UNFUSED
    # layout (reference checkpoints store separate q/k/v); qkv fusion and
    # quantization are the last transforms, in that order
    import dataclasses as _dc
    dit = CogVideoXTransformer(_dc.replace(dcfg, quant=None, fuse_qkv=False))
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(pcfg.nf_latent), np.arange(hp), np.arange(wp))
    n_vip = min(rcfg.num_temporal_queries + 1, pcfg.nf_latent)
    dit_params = dit.init(
        r3,
        jnp.zeros((1, pcfg.nf_latent, 16, pcfg.height // 8, pcfg.width // 8)),
        jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32),
        vip_hidden_states=jnp.zeros((1, n_vip, vc.output_dim, vc.num_height_queries, vc.num_width_queries)),
        image_rotary_emb=rope,
        vip_image_rotary_emb=rope,
        vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(
            d, np.arange(n_vip), np.arange(vc.num_height_queries), np.arange(vc.num_width_queries)),
    )
    dit_tree = _load_converted(cfg, "to2v_dit")
    if dit_tree is not None:
        # convert_weights.py output already carries the vip.pt overlay — no graft
        dit_params = {"params": dit_tree}
    elif ckpt and os.path.isdir(ckpt):
        from tokensgen_tpu.convert.safetensors_io import load_safetensors
        from tokensgen_tpu.convert.torch_weights import convert_dit
        sd = {}
        for name in os.listdir(ckpt):
            if name.endswith(".safetensors"):
                sd.update(load_safetensors(os.path.join(ckpt, name)))
        if sd:
            dit_params = {"params": convert_dit(sd, dcfg)}
            print(f"loaded DiT weights from {ckpt}", flush=True)
    else:
        dit_params = {"params": graft_vip_params(dit_params["params"], dcfg)}
    if dcfg.fuse_qkv:
        from tokensgen_tpu.models.dit import fuse_qkv_params
        dit_params = {"params": fuse_qkv_params(dit_params["params"],
                                                fuse_vip=dcfg.fuse_vip_qkv)}
    if dcfg.quant:
        from tokensgen_tpu.models.dit import quantize_dit_params
        dit_params = {"params": quantize_dit_params(dit_params["params"], dcfg)}
        print(f"quantized DiT dense projections: {dcfg.quant}", flush=True)

    # DINOv2 conditioning path (`use_vae_as_encoder: false`,
    # `infer_cogvideo_mp_fifo.py:138-183` image_encoder_path)
    image_encoder = None
    if not cfg.get("use_vae_as_encoder", True):
        from tokensgen_tpu.models.dinov2 import (
            DINOv2Config, DINOv2Encoder, load_dinov2)

        enc_dir = cfg.get("image_encoder_path")
        if enc_dir and os.path.isdir(enc_dir):
            image_encoder = load_dinov2(enc_dir)
            print(f"loaded DINOv2 image encoder from {enc_dir}", flush=True)
        else:
            ecfg = DINOv2Config.tiny() if smoke else DINOv2Config.large()
            enc = DINOv2Encoder(ecfg)
            enc_params = enc.init(
                jax.random.PRNGKey(7),
                jnp.zeros((1, 3, ecfg.image_size, ecfg.image_size)))
            image_encoder = (enc, enc_params)

    sched = S.make_schedule(S.ScheduleConfig())
    return To2VPipeline(pcfg, dcfg, dit_params, rcfg, rs_params, vae, sched,
                        image_encoder=image_encoder), dcfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--queue-devices", type=int, default=None,
                    help="shard FIFO ranks over this many devices")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.data.video_io import load_video, write_video
    from tokensgen_tpu.sharding import MeshSpec, make_mesh
    from tokensgen_tpu.utils.config import create_output_folders, input_items, load_config

    cfg = load_config(args.config)
    run_dir = create_output_folders(cfg.get("output_dir", "./outputs"),
                                    cfg.get("name_prefix", "infer"), args.config)
    pipe, dcfg = build_pipeline(cfg, args.smoke)

    # 2nd stage (gen workload): T2To token generator
    # (`infer_cogvideo_mp_fifo.py:219-234,266-279`)
    t2to_pipe = None
    if cfg.get("use_2nd_stage"):
        from tokensgen_tpu.core import pca as pca_lib
        from tokensgen_tpu.models.dit import DiTConfig as DC
        from tokensgen_tpu.models.dit import CogVideoXTransformer
        from tokensgen_tpu.pipelines.t2to import T2ToConfig, T2ToPipeline

        if args.smoke:
            t2cfg = T2ToConfig(num_inference_steps=4,
                               num_frames_per_chunk=pipe.resampler_config.num_temporal_queries,
                               token_dim=pipe.resampler_config.output_dim,
                               height=pipe.resampler_config.num_height_queries,
                               width=pipe.resampler_config.num_width_queries,
                               stochastic=False)
            t2dcfg = DC.tiny(patch_size=1,
                             sample_height=t2cfg.height, sample_width=t2cfg.width,
                             attention_head_dim=64, num_attention_heads=1)
        else:
            t2cfg = T2ToConfig(num_inference_steps=cfg.get("num_inference_steps", 52))
            t2dcfg = DC.t2to_5b()
        t2model = CogVideoXTransformer(t2dcfg)
        t2pipe_tmp = T2ToPipeline(t2cfg, t2dcfg, None)
        f0 = 2 * t2cfg.num_frames_per_chunk
        t2params = t2model.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, f0, t2cfg.latent_channels, t2cfg.height, t2cfg.width)),
            jnp.zeros((1, t2dcfg.max_text_seq_length, t2dcfg.text_embed_dim)),
            jnp.zeros((1,), jnp.int32),
            image_rotary_emb=t2pipe_tmp.rope(f0),
        )
        # pca/mean/std artifacts
        if not args.smoke and cfg.get("longvgen_pca"):
            from tokensgen_tpu.convert.safetensors_io import load_safetensors

            pca_sd = load_safetensors(cfg.longvgen_pca)
            pca_state = pca_lib.PCAState(
                mean=jnp.asarray(pca_sd["mean_"]),
                components=jnp.asarray(pca_sd["components_"]))
            mean = jnp.asarray(np.load(cfg.longvgen_mean))
            std = jnp.asarray(np.load(cfg.longvgen_std))
        else:
            rng0 = np.random.default_rng(0)
            # sample count >= token_dim: inverse_transform needs the full
            # square component matrix (SVD yields min(n_samples, dim) comps)
            pca_state = pca_lib.fit(
                jnp.asarray(rng0.normal(size=(t2cfg.token_dim + 64,
                                              t2cfg.token_dim)),
                            jnp.float32), None)
            mean = jnp.zeros((1, t2cfg.token_dim))
            std = jnp.ones((1, t2cfg.token_dim))
        t2to_pipe = T2ToPipeline(t2cfg, t2dcfg, t2params, pca=pca_state,
                                 token_mean=mean, token_std=std)

    mesh = None
    nq = args.queue_devices or cfg.get_path("sampling_params.queue_devices", 1)
    if nq > 1:
        mesh = make_mesh(MeshSpec(data=1, queue=nq))

    def text_embeds_for(prompt):
        h = abs(hash(prompt)) % (2**31)
        arr = np.random.default_rng(h).normal(
            size=(1, dcfg.max_text_seq_length, dcfg.text_embed_dim)) * 0.02
        return jnp.asarray(arr, jnp.float32)

    for item in input_items(cfg):
        name = item["name"]
        print(f"--- item {name}", flush=True)
        prompt = item.get("prompt", "")
        num_chunks = item.get("max_num_chunks", 2)
        frames = None
        image_embeddings = None
        if t2to_pipe is not None and not item.get("video"):
            # gen workload: condensed tokens from text, then To2V renders them
            from tokensgen_tpu.pipelines.t2to import extend_generated_tokens

            toks = t2to_pipe(
                text_embeds_for(prompt), text_embeds_for(""),
                num_chunks=num_chunks, rng=jax.random.PRNGKey(cfg.get("seed_2nd", 42)),
            )
            np.save(os.path.join(run_dir, f"{name}_tokens.npy"), np.asarray(toks))
            toks = extend_generated_tokens(toks, num_chunks)
            if pipe.cfg.use_separate_guidance:
                uncond = jnp.zeros_like(toks)
                image_embeddings = jnp.concatenate([toks, uncond, toks], axis=0)
            else:
                image_embeddings = jnp.concatenate([toks, toks], axis=0)
        if item.get("video"):
            src = load_video(
                item["video"],
                sample_fps=item.get("sample_fps", 10),
                # the pipeline resolution defines the model input size
                output_res=(pipe.cfg.height, pipe.cfg.width),
                max_frames=num_chunks * pipe.cfg.num_frames_per_chunk,
            )
            frames = jnp.asarray(src)
            write_video(os.path.join(run_dir, f"{name}_source.mp4"), src[0],
                        fps=item.get("output_fps", 10))
        if frames is None and image_embeddings is None:
            # edit items need a source video (the shipped configs leave
            # `video: null` as a placeholder); smoke synthesizes one so the
            # stock configs run out of the box
            if args.smoke:
                rng0 = np.random.default_rng(0)
                frames = jnp.asarray(rng0.uniform(
                    -1, 1, size=(1, num_chunks * pipe.cfg.num_frames_per_chunk,
                                 pipe.cfg.height, pipe.cfg.width, 3)),
                    jnp.float32)
                print(f"item {name}: smoke — synthesized random source video",
                      flush=True)
            else:
                raise ValueError(
                    f"item {name}: the edit workload needs a `video:` path "
                    f"(set it in input_config), or enable `use_2nd_stage: "
                    f"true` for text-to-long-video generation")

        out = pipe.generate(
            text_embeds_for(prompt), text_embeds_for(""),
            frames=frames, image_embeddings=image_embeddings, num_chunks=num_chunks,
            rng=jax.random.PRNGKey(cfg.get("seed", 42)),
            mesh=mesh,
            cache_idx=tuple(cfg.get("cache_idx") or ()),
        )
        video = np.asarray(out["video"][0])
        write_video(os.path.join(run_dir, f"{name}_fifo.mp4"), video,
                    fps=item.get("output_fps", 10))
        write_video(os.path.join(run_dir, f"{name}_orig.mp4"),
                    np.asarray(out["orig_video"][0]), fps=item.get("output_fps", 10))
        np.save(os.path.join(run_dir, f"{name}_latents.npy"),
                np.asarray(out["latents"]))
        for ci, cv in enumerate(out.get("cache_videos") or []):
            write_video(os.path.join(run_dir, f"{name}_cache{ci}.mp4"),
                        np.asarray(cv[0]), fps=item.get("output_fps", 10))
        print(f"item {name}: wrote {video.shape[0]} frames", flush=True)
    print(f"done -> {run_dir}", flush=True)


if __name__ == "__main__":
    main()

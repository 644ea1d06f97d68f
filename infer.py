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
import time

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


def _report_weight_provenance(prov: dict, smoke: bool) -> None:
    """One summary line of where every module's weights came from, plus a loud
    warning when a non-smoke run is conditioned on random inits. The reference
    CLI always runs real checkpoints (`infer_cogvideo_mp_fifo.py:138-183`);
    here weights-free environments fall back to random params, which is fine
    for perf/e2e work but must never pass silently in a production run."""
    print("weights: " + "  ".join(f"{k}={v}" for k, v in prov.items()),
          flush=True)
    rand = [k for k, v in prov.items() if v.startswith("random")]
    if rand and not smoke:
        print("WARNING: non-smoke run with RANDOM weights for: "
              + ", ".join(rand)
              + " — outputs are not real videos. Set `converted_weights_dir` "
              "(convert_weights.py) or `pretrained_model_name_or_path`.",
              flush=True)


def _tree_has_vip(tree) -> bool:
    """True when any key in the nested param tree belongs to the VIP branch."""
    if isinstance(tree, dict):
        return any(
            ("vip" in str(k)) or _tree_has_vip(v) for k, v in tree.items())
    return False


def build_text_encoder(cfg, smoke: bool):
    """The real T5 whenever a checkpoint is configured; the sha256 hash encoder
    only under --smoke or an explicit `allow_hash_text_encoder: true`.

    Checkpoint resolution order: `converted_weights_dir/t5.safetensors` ->
    `pretrained_text_encoder_path` -> `<pretrained_model_name_or_path>/
    text_encoder` (the CogVideoX-5b layout). The tokenizer comes from
    `pretrained_tokenizer_path`, the weights dir itself, or the sibling
    `tokenizer/` dir."""
    from tokensgen_tpu.models.dit import DiTConfig
    from tokensgen_tpu.models.text_encoder import make_text_encoder

    probe = DiTConfig.tiny() if smoke else DiTConfig.cogvideox_5b()
    conv_dir = cfg.get("converted_weights_dir")
    conv_t5 = os.path.join(conv_dir, "t5.safetensors") if conv_dir else None
    if conv_t5 and not os.path.isfile(conv_t5):
        conv_t5 = None
    enc_dir = cfg.get("pretrained_text_encoder_path")
    ckpt = cfg.get("pretrained_model_name_or_path")
    if not enc_dir and ckpt and os.path.isdir(os.path.join(ckpt, "text_encoder")):
        enc_dir = os.path.join(ckpt, "text_encoder")
    tok_dir = cfg.get("pretrained_tokenizer_path")
    if not tok_dir and ckpt and os.path.isdir(os.path.join(ckpt, "tokenizer")):
        tok_dir = os.path.join(ckpt, "tokenizer")
    allow_hash = smoke or bool(cfg.get("allow_hash_text_encoder", False))
    if not (conv_t5 or enc_dir) and not allow_hash:
        raise ValueError(
            "no text encoder configured: set `pretrained_text_encoder_path` "
            "(HF T5 dir), `converted_weights_dir` (with t5.safetensors), or "
            "opt into pseudo-embeddings with `allow_hash_text_encoder: true` "
            "/ --smoke")
    return make_text_encoder(
        enc_dir, probe.max_text_seq_length, probe.text_embed_dim,
        allow_hash_fallback=allow_hash, converted_path=conv_t5,
        tokenizer_dir=tok_dir)


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
    # `sp_devices`: Ulysses sequence parallelism over the mesh `model` axis —
    # attention all_to_alls seq<->heads, dense/FF run sequence-sharded
    # (kernels/attention.py sp_axis; SURVEY §2.3 optional SP target). The
    # production joint sequence (18,256) and 48 heads divide by 2/4/8/16.
    # Mutually exclusive with queue sharding (one parallel axis per run).
    sp = int(cfg.get("sp_devices", 1))
    if sp > 1:
        if sp > jax.device_count():
            raise ValueError(f"sp_devices={sp} exceeds {jax.device_count()} devices")
        from tokensgen_tpu.sharding import MeshSpec as _MS, make_mesh as _mm

        jax.set_mesh(_mm(_MS(data=1, model=sp)))
        print(f"sequence parallel: sp={sp} (Ulysses, mesh `model` axis)",
              flush=True)
    sp_axis = "model" if sp > 1 else None
    if smoke:
        vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=2,
                       num_width_queries=3, length=3 * 2 * 3)
        dcfg = DiTConfig.tiny(vip=vc, sample_height=4, sample_width=6,
                              sp_axis=sp_axis,
                              quant=cfg.get("quant") or None,
                              quant_attn=cfg.get("quant_attn", False),
                              fuse_qkv=cfg.get("fuse_qkv",
                                               not cfg.get("quant")))
        rcfg = ResamplerConfig.tiny(embedding_dim=dcfg.inner_dim, output_dim=24,
                                    num_temporal_queries=2, num_height_queries=2,
                                    num_width_queries=3)
        vcfg = VAEConfig.tiny(sample_height=32, sample_width=48)
        pcfg = To2VConfig(height=32, width=48, num_frames_per_chunk=9,
                          num_inference_steps=6, num_partitions=2,
                          vip_scale=(vp.get("scale") or [1.0])[0],
                          use_vae_as_encoder=cfg.get("use_vae_as_encoder", True),
                          use_dynamic_cfg=cfg.get("use_dynamic_cfg", False),
                          tail_renoise_mode=cfg.get_path(
                              "sampling_params.tail_renoise_mode", "xt"))
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
        # fuse_qkv: identical math, ~6% faster bf16 step — but the int8 path
        # prefers the narrower unfused matmuls (6.00 vs 6.13 s measured), so
        # the default follows the quant mode (PERF.md rounds 3-4)
        # quant_attn: int8 score matmul in the flash kernel — measured 1.04x
        # on attention with ~2x the bf16 kernel's output noise; off by default
        # even under quant=w8a8 (PERF.md round 3)
        dcfg = DiTConfig.cogvideox_5b(vip=vc, ff_chunks=4, sp_axis=sp_axis,
                                      quant=cfg.get("quant") or None,
                                      quant_attn=cfg.get("quant_attn", False),
                                      fuse_qkv=cfg.get("fuse_qkv",
                                                       not cfg.get("quant")))
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
            # dynamic CFG `1+g·(1−cos(π·((T−t)/T)^5))/2` + tail renoise mode
            # (`pipeline_cogvideox_mp_fifo.py:1253-1266`,
            #  `cogvideo_sampling.py:115-128` randn vs mp_v2's add_noise_to_xt)
            use_dynamic_cfg=cfg.get("use_dynamic_cfg", False),
            tail_renoise_mode=cfg.get_path(
                "sampling_params.tail_renoise_mode", "xt"),
        )

    rng = jax.random.PRNGKey(cfg.get("seed", 42))
    r1, r2, r3 = jax.random.split(rng, 3)

    # weights: converted checkpoints when configured, random init otherwise
    prov = {}
    ckpt = cfg.get("pretrained_model_name_or_path")
    vae_model = AutoencoderKLCogVideoX(vcfg)
    vae_tree = _load_converted(cfg, "vae")
    if vae_tree is not None:
        vae_params = {"params": vae_tree}
        prov["vae"] = "converted"
    else:
        vae_params = vae_model.init(
            r1, jnp.zeros((1, pcfg.num_frames_per_chunk, pcfg.height, pcfg.width, 3)))
        prov["vae"] = "random"
    vae = VAERunner(vcfg, vae_params, use_tiling=not smoke)

    rs = Resampler(rcfg)
    hp = pcfg.height // 8 // dcfg.patch_size
    wp = pcfg.width // 8 // dcfg.patch_size
    rs_tree = _load_converted(cfg, "resampler")
    if rs_tree is not None:
        rs_params = {"params": rs_tree}
        prov["resampler"] = "converted"
    else:
        rs_params = rs.init(
            r2, jnp.zeros((1, pcfg.nf_latent, hp * wp, rcfg.embedding_dim)))
        prov["resampler"] = "random"

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    d = dcfg.attention_head_dim
    # init / checkpoint-convert / graft run on the full-precision UNFUSED
    # layout (reference checkpoints store separate q/k/v); qkv fusion and
    # quantization are the last transforms, in that order
    import dataclasses as _dc
    dit = CogVideoXTransformer(_dc.replace(dcfg, quant=None, fuse_qkv=False))
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(pcfg.nf_latent), np.arange(hp), np.arange(wp))
    n_vip = min(rcfg.num_temporal_queries + 1, pcfg.nf_latent)
    dit_tree = _load_converted(cfg, "to2v_dit")
    if dit_tree is not None:
        # convert_weights.py output carries the vip.pt overlay when vip.pt was
        # present at convert time (manifest `to2v_dit.vip`); a tree without the
        # VIP branch cannot drive VIP-conditioned inference — fail here with a
        # clear message instead of a missing-parameter error from flax apply
        if not _tree_has_vip(dit_tree):
            raise ValueError(
                "converted to2v_dit tree has no VIP branch (vip.pt was absent "
                "at convert_weights.py time — manifest records to2v_dit.vip: "
                "false). Re-convert with TokensGen-To2V/vip.pt in place; VIP-"
                "conditioned inference needs the trained adapters.")
        dit_params = {"params": dit_tree}
        prov["to2v_dit"] = "converted"
    else:
        # random init only when no converted tree exists — the full 5b init is
        # expensive and would be discarded
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
        sd = {}
        if ckpt and os.path.isdir(ckpt):
            from tokensgen_tpu.convert.safetensors_io import load_safetensors
            for name in os.listdir(ckpt):
                if name.endswith(".safetensors"):
                    sd.update(load_safetensors(os.path.join(ckpt, name)))
        if sd:
            from tokensgen_tpu.convert.torch_weights import convert_dit
            dit_params = {"params": convert_dit(sd, dcfg)}
            print(f"loaded DiT weights from {ckpt}", flush=True)
            prov["to2v_dit"] = "torch-checkpoint"
        else:
            dit_params = {"params": graft_vip_params(dit_params["params"], dcfg)}
            prov["to2v_dit"] = "random(grafted vip)"
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
            prov["dinov2"] = "checkpoint"
        else:
            ecfg = DINOv2Config.tiny() if smoke else DINOv2Config.large()
            enc = DINOv2Encoder(ecfg)
            enc_params = enc.init(
                jax.random.PRNGKey(7),
                jnp.zeros((1, 3, ecfg.image_size, ecfg.image_size)))
            image_encoder = (enc, enc_params)
            prov["dinov2"] = "random"

    _report_weight_provenance(prov, smoke)
    sched = S.make_schedule(S.ScheduleConfig())
    return To2VPipeline(pcfg, dcfg, dit_params, rcfg, rs_params, vae, sched,
                        image_encoder=image_encoder), dcfg


def build_t2to_pipeline(cfg, smoke: bool, pipe):
    """T2To token-generator stage (gen workload / serving two-stage path):
    converted TokensGen-T2To weights + pca/mean/std artifacts when available,
    random init as the weights-free fallback
    (`infer_cogvideo_mp_fifo.py:219-234`)."""
    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.core import pca as pca_lib
    from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig as DC
    from tokensgen_tpu.pipelines.t2to import T2ToConfig, T2ToPipeline

    if smoke:
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
    # converted TokensGen-T2To weights when available (the full-finetune
    # transformer exported by convert_weights.py as t2to_dit.safetensors);
    # random init is the weights-free fallback only
    t2prov = {}
    t2_tree = _load_converted(cfg, "t2to_dit")
    if t2_tree is not None:
        t2params = {"params": t2_tree}
        t2prov["t2to_dit"] = "converted"
    else:
        t2prov["t2to_dit"] = "random"
        t2params = t2model.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, f0, t2cfg.latent_channels, t2cfg.height, t2cfg.width)),
            jnp.zeros((1, t2dcfg.max_text_seq_length, t2dcfg.text_embed_dim)),
            jnp.zeros((1,), jnp.int32),
            image_rotary_emb=t2pipe_tmp.rope(f0),
        )
    # pca/mean/std artifacts
    if not smoke and cfg.get("longvgen_pca"):
        from tokensgen_tpu.convert.safetensors_io import load_safetensors

        pca_sd = load_safetensors(cfg.longvgen_pca)
        pca_state = pca_lib.PCAState(
            mean=jnp.asarray(pca_sd["mean_"]),
            components=jnp.asarray(pca_sd["components_"]))
        mean = jnp.asarray(np.load(cfg.longvgen_mean))
        std = jnp.asarray(np.load(cfg.longvgen_std))
        t2prov["pca"] = "artifacts"
    else:
        t2prov["pca"] = "random(identity-scale)"
        rng0 = np.random.default_rng(0)
        # sample count >= token_dim: inverse_transform needs the full
        # square component matrix (SVD yields min(n_samples, dim) comps)
        pca_state = pca_lib.fit(
            jnp.asarray(rng0.normal(size=(t2cfg.token_dim + 64,
                                          t2cfg.token_dim)),
                        jnp.float32), None)
        mean = jnp.zeros((1, t2cfg.token_dim))
        std = jnp.ones((1, t2cfg.token_dim))
    _report_weight_provenance(t2prov, smoke)
    return T2ToPipeline(t2cfg, t2dcfg, t2params, pca=pca_state,
                        token_mean=mean, token_std=std)


def main():
    from tokensgen_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # make JAX_PLATFORMS effective despite the pinned plugin
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

    # Phase 0 — text encode (reference: tokenizer+T5 load at
    # `infer_cogvideo_mp_fifo.py:123-134`, 226-token prompt encode at
    # `pipeline_cogvideox_mp_fifo.py:365-486`). All prompts (+ the CFG
    # negative "") are encoded BEFORE any model params exist on device, then
    # the ~9.5 GB bf16 T5-XXL is dropped — the offload phase orchestration's
    # first phase on a 16 GB chip.
    items = list(input_items(cfg))
    prompts = sorted({it.get("prompt", "") for it in items} | {""})
    text_enc = build_text_encoder(cfg, args.smoke)
    _t0 = time.time()
    embeds = {p: np.asarray(text_enc([p]))[0] for p in prompts}
    print(f"encoded {len(prompts)} prompts in {time.time() - _t0:.1f}s "
          f"({type(text_enc.inner).__name__})", flush=True)
    del text_enc  # frees the T5 params before the DiT/VAE phases

    def text_embeds_for(prompt):
        return jnp.asarray(embeds[prompt])[None]

    pipe, dcfg = build_pipeline(cfg, args.smoke)

    # 2nd stage (gen workload): T2To token generator
    # (`infer_cogvideo_mp_fifo.py:219-234,266-279`)
    t2to_pipe = None
    if cfg.get("use_2nd_stage"):
        t2to_pipe = build_t2to_pipeline(cfg, args.smoke, pipe)

    mesh = None
    nq = args.queue_devices or cfg.get_path("sampling_params.queue_devices", 1)
    if nq > 1:
        if int(cfg.get("sp_devices", 1)) > 1:
            raise ValueError("sp_devices and queue_devices are mutually "
                             "exclusive — pick one parallel axis per run")
        mesh = make_mesh(MeshSpec(data=1, queue=nq))

    for item in items:
        name = item["name"]
        print(f"--- item {name}", flush=True)
        prompt = item.get("prompt", "")
        # FIFO chunk cap (`config/infer/gen.yaml` max_num_chunks_w_fifo: 25)
        num_chunks = min(item.get("max_num_chunks", 2),
                         item.get("max_num_chunks_w_fifo", 25))
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
                start_t=item.get("start_t", 0.0),
                end_t=item.get("end_t", -1.0),
                # the pipeline resolution defines the model input size
                output_res=(pipe.cfg.height, pipe.cfg.width),
                crop_to_fit=item.get("crop_to_fit", True),
                pad_to_fit=item.get("pad_to_fit", False),
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

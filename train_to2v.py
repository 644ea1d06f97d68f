"""To2V adapter training CLI.

TPU-native counterpart of `accelerate launch train_cogvideo_to2v.py --config ...`
(`/root/reference/train_cogvideo_to2v.py`): one SPMD process drives the whole
mesh — per-host data sharding replaces DDP ranks, XLA grad psum replaces NCCL,
`optax.MultiSteps` replaces accumulate-9, orbax replaces accelerate save hooks.

Usage:
  python train_to2v.py --config tokensgen_tpu/configs/train_to2v.yaml \
      [--max-steps N] [--smoke]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    from tokensgen_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # make JAX_PLATFORMS effective despite the pinned plugin
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + synthetic data, CPU-friendly")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed for multi-host TPU pods")
    ap.add_argument("--profile-steps", type=int, default=0,
                    help="capture a jax.profiler trace for the first N steps")
    args = ap.parse_args()

    import jax

    if args.multihost:
        # multi-host entry (SURVEY §7.2 item 8): one process per host, all hosts
        # run the same SPMD program; DCN coordination via jax.distributed
        jax.distributed.initialize()
    import jax.numpy as jnp
    import optax

    from tokensgen_tpu.core import schedule as S
    from tokensgen_tpu.models.dit import DiTConfig, VIPConfig
    from tokensgen_tpu.models.resampler import ResamplerConfig
    from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner
    from tokensgen_tpu.sharding import MeshSpec, make_mesh, replicate, shard_batch
    from tokensgen_tpu.train import checkpoint as CK
    from tokensgen_tpu.train import staging, to2v
    from tokensgen_tpu.utils.config import create_output_folders, load_config
    from tokensgen_tpu.utils.logging import ParamAudit, TBLogger

    cfg = load_config(args.config)
    run_dir = create_output_folders(cfg.get("output_dir", "./outputs"),
                                    cfg.get("name_prefix", "to2v"), args.config)
    print(f"run dir: {run_dir}", flush=True)

    # --- parallel layout: mesh (data, model) ---
    # `tp_devices`: Megatron-style tensor parallelism over the DiT's 48
    # attention heads / FFN (sharding/tp.py; SURVEY §2.3 optional TP target,
    # reference capability anchor `attention_processor.py:1885-1954`).
    # Composes with data parallelism: dp = device_count / tp.
    tp = int(cfg.get("tp_devices", 1))
    # `sp_devices`: Ulysses sequence parallelism — attention all_to_alls
    # seq<->heads inside a shard_map over the same `model` mesh axis
    # (kernels/attention.py sp_axis; SURVEY §2.3 optional SP target). The
    # all_to_all transposes cleanly under AD, so the train step differentiates
    # through it. Mutually exclusive with tp_devices (one model axis).
    sp = int(cfg.get("sp_devices", 1))
    if tp > 1 and sp > 1:
        raise ValueError("tp_devices and sp_devices are mutually exclusive")
    nmodel = max(tp, sp)
    ndev = jax.device_count()
    if nmodel < 1 or ndev % nmodel:
        raise ValueError(
            f"tp/sp devices={nmodel} must divide device count {ndev}")
    # `dp_devices`: optionally use fewer data ranks than available (e.g. a
    # tp-vs-dp equality check on one host); default fills the machine
    dp = int(cfg.get("dp_devices", 0)) or (ndev // nmodel)
    if dp * nmodel > ndev:
        raise ValueError(f"dp({dp}) x model({nmodel}) exceeds {ndev} devices")
    mesh = make_mesh(MeshSpec(data=dp, model=nmodel))
    if nmodel > 1:
        # ambient mesh BEFORE any model apply/init: the Pallas attention op
        # shard_maps itself over heads (tp) or sequence (sp)
        # (kernels/attention.py tp_axis/sp_axis paths)
        jax.set_mesh(mesh)
        if tp > 1:
            print(f"tensor parallel: tp={tp} x dp={dp} mesh", flush=True)
        else:
            print(f"sequence parallel (Ulysses): sp={sp} x dp={dp} mesh",
                  flush=True)

    # --- model configs ---
    if args.smoke or cfg.get("model_size") == "tiny":
        vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=2,
                       num_width_queries=3, length=3 * 2 * 3)
        dcfg = DiTConfig.tiny(vip=vc, sample_height=4, sample_width=6,
                              tp_axis="model" if tp > 1 else None,
                              sp_axis="model" if sp > 1 else None)
        rcfg = ResamplerConfig.tiny(embedding_dim=dcfg.inner_dim, output_dim=24,
                                    num_temporal_queries=2, num_height_queries=2,
                                    num_width_queries=3)
        vcfg = VAEConfig.tiny(sample_height=32, sample_width=48)
        height, width, nf_px = 32, 48, 9
    else:
        vp = cfg.get("video_ipadapter_params", {})
        rp = vp.get("resampler_params", {})
        vc = VIPConfig(
            length=vp.get("length", 480),
            scale=(vp.get("scale", [1.0]) or [1.0])[0],
            output_dim=rp.get("output_dim", 3072),
            num_temporal_queries=rp.get("num_temporal_queries", 4),
            num_height_queries=rp.get("num_height_queries", 8),
            num_width_queries=rp.get("num_width_queries", 12),
        )
        dcfg = DiTConfig.cogvideox_5b(vip=vc, remat=True,
                                      tp_axis="model" if tp > 1 else None,
                                      sp_axis="model" if sp > 1 else None)
        rcfg = ResamplerConfig(**{k: v for k, v in rp.items()
                                  if k in ResamplerConfig.__dataclass_fields__})
        vcfg = VAEConfig.cogvideox()
        height = cfg.get_path("train_data_params.height", 480)
        width = cfg.get_path("train_data_params.width", 720)
        nf_px = cfg.get_path("train_data_params.chunk_size", 49)

    sched = S.make_schedule(S.ScheduleConfig())
    tcfg = to2v.To2VTrainConfig(
        learning_rate=cfg.get("learning_rate", 2e-4),
        diff_timesteps_ratio=cfg.get("diff_timesteps_ratio", 0.4),
        use_8bit_adam=cfg.get("use_8bit_adam", True),
        optimizer=cfg.get("optimizer", "adamw"),
        lr_scheduler=cfg.get("lr_scheduler", "constant"),
        lr_warmup_steps=cfg.get("lr_warmup_steps", 0),
        lr_num_cycles=cfg.get("lr_num_cycles", 1),
        lr_power=cfg.get("lr_power", 1.0),
        max_train_steps=cfg.get("max_train_steps", 1000),
        num_processes=dp,
        # LoRA finetuning (reference peft path `train_cogvideo_to2v.py:
        # 1326-1338`; rank/alpha config keys, default-off)
        lora_rank=cfg.get("lora_rank", 0),
        lora_alpha=cfg.get("lora_alpha", 64.0),
        lora_targets=tuple(cfg.get("lora_targets",
                                   ["to_q", "to_k", "to_v", "to_out"])),
    )
    accum = cfg.get("gradient_accumulation_steps", 1)
    batch_size = cfg.get("per_gpu_batch_size", 1) * dp  # global
    if cfg.get("scale_lr"):
        # `--scale_lr`: lr *= accum * per-device batch * ranks (`:1441-1444`)
        import dataclasses as _dc
        tcfg = _dc.replace(tcfg, learning_rate=tcfg.learning_rate * accum
                           * cfg.get("per_gpu_batch_size", 1) * dp)
    max_chunks = cfg.get_path("train_data_params.max_num_chunks", 2)

    # --- params ---
    rng = jax.random.PRNGKey(cfg.get("seed", 42))
    # the host pipeline produces this host's share; shard_batch assembles the
    # global array from per-process data under multi-host
    b = max(1, batch_size // jax.process_count())
    nf = (nf_px - 1) // 4 + 1
    h_lat = height // 8
    w_lat = width // 8

    vae_model = AutoencoderKLCogVideoX(vcfg)
    vae_params = vae_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, nf_px, height, width, 3))
    )
    vae = VAERunner(vcfg, vae_params)

    example = {
        "latents": jnp.zeros((b, nf, 16, h_lat, w_lat)),
        "vip_input": jnp.zeros((b, nf, (h_lat // dcfg.patch_size) * (w_lat // dcfg.patch_size), rcfg.embedding_dim)),
        "text_embeds": jnp.zeros((b, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
    }
    params = to2v.init_params(dcfg, rcfg, rng, example,
                              lora_rank=tcfg.lora_rank,
                              lora_targets=tcfg.lora_targets)
    if tcfg.lora_rank > 0:
        from tokensgen_tpu.train.lora import lora_param_count

        print(f"lora: rank={tcfg.lora_rank} alpha={tcfg.lora_alpha} "
              f"targets={list(tcfg.lora_targets)} "
              f"({lora_param_count(params['lora'])/1e6:.2f}M params)",
              flush=True)
    # frozen base stored bf16 (the trainable vip/resampler leaves stay f32
    # masters): halves the frozen params' HBM and removes the per-step
    # f32->bf16 convert temps (see to2v.cast_frozen_bf16)
    params = to2v.cast_frozen_bf16(params)
    optimizer = to2v.make_optimizer(params, tcfg, accum_steps=accum)
    opt_state = optimizer.init(params)
    step0 = 0
    if args.resume:
        restored, step0 = CK.restore_checkpoint(
            os.path.join(cfg.get("output_dir", "./outputs"), "checkpoints"),
            target={"params": params, "opt_state": opt_state})
        if restored is not None:
            params, opt_state = restored["params"], restored["opt_state"]
            print(f"resumed from step {step0}", flush=True)
        step0 = step0 or 0

    audit = ParamAudit(run_dir)
    audit.write(params, to2v.trainable_labels(params))

    # --- param placement + jitted step (mesh built above) ---
    train_step = jax.jit(to2v.make_train_step(dcfg, rcfg, sched, tcfg, optimizer))
    if tp > 1:
        from tokensgen_tpu.sharding.tp import shard_dit_params

        sharded = {"dit": shard_dit_params(mesh, params["dit"]),
                   "resampler": replicate(mesh, params["resampler"])}
        if "lora" in params:
            sharded["lora"] = replicate(mesh, params["lora"])
        params = sharded
    else:
        params = replicate(mesh, params)
    if cfg.get("zero1", False):
        # ZeRO-1: optimizer state sharded over the data axis; XLA inserts the
        # reduce-scatter/all-gather around the update (sharding/zero.py)
        from tokensgen_tpu.sharding.zero import shard_opt_state

        opt_state = shard_opt_state(opt_state, mesh)
    else:
        opt_state = replicate(mesh, opt_state)

    # --- data ---
    def synthetic_batches():
        host = np.random.default_rng(0)
        while True:
            yield {
                "pixel_values": host.uniform(-1, 1, size=(b, max_chunks * nf_px, height, width, 3)).astype(np.float32),
                "start_frame_idx": host.integers(0, 50, size=(b,)),
                "drop_image_embed": (host.uniform(size=(b,)) < 0.05).astype(np.int32),
                "prompt": ["synthetic"] * b,
            }

    if args.smoke or not cfg.get_path("train_data_params.csv_file"):
        batches = synthetic_batches()
    else:
        from tokensgen_tpu.data import MiraDataset, batch_iterator

        ds = MiraDataset(
            cfg.get_path("train_data_params.csv_file"),
            cfg.get_path("train_data_params.video_dir"),
            height=height, width=width,
            sample_fps=cfg.get_path("train_data_params.sample_fps", 10),
            chunk_size=nf_px, max_num_chunks=max_chunks,
            use_scene_detect=bool(cfg.get_path("train_data_params.use_scene_detect", False)),
            scene_detect_file=cfg.get_path("train_data_params.scene_detect_file"),
            seed=cfg.get("seed", 42),
        )

        def epoch_iter():
            epoch = 0
            while True:
                yield from batch_iterator(
                    ds, b, seed=cfg.get("seed", 42) + epoch,
                    num_shards=jax.process_count(),
                    shard_index=jax.process_index(),
                    # decode pool: one sequential cv2 decoder falls short of
                    # the 16.3 s/step budget (tools/bench_data_pipeline.py,
                    # PERF.md); reference uses a multi-worker DataLoader
                    # (`train_cogvideo_to2v.py:1540-1550`)
                    num_workers=cfg.get("dataloader_num_workers", 4))
                epoch += 1

        batches = epoch_iter()

    from tokensgen_tpu.models.text_encoder import make_text_encoder

    text_embeds_for = make_text_encoder(
        cfg.get("pretrained_text_encoder_path"),
        dcfg.max_text_seq_length, dcfg.text_embed_dim,
        allow_hash_fallback=args.smoke,
    )

    # validation items: held-out CSV with fixed indices
    # (`config/train/*_to2v.yaml:123-140` semantics)
    val_items = None
    if cfg.get_path("val_data_params.csv_file"):
        from tokensgen_tpu.data import MiraDataset as _MD

        val_ds = _MD(
            cfg.get_path("val_data_params.csv_file"),
            cfg.get_path("val_data_params.video_dir"),
            height=height, width=width,
            sample_fps=cfg.get_path("val_data_params.sample_fps", 10),
            chunk_size=nf_px,
            max_num_chunks=cfg.get_path("val_data_params.max_num_chunks", 2),
            random_sample=False, i_drop_rate=0, t_drop_rate=0, ti_drop_rate=0,
        )
        idxs = cfg.get_path("val_data_params.indices", [0])
        val_items = [val_ds[i] for i in idxs]

    tb = TBLogger(run_dir)
    host_rng = np.random.default_rng(cfg.get("seed", 42))
    max_steps = args.max_steps or cfg.get("max_train_steps", 100)
    ckpt_every = cfg.get("checkpointing_steps", 500)
    val_every = cfg.get("validation_steps", 0)
    ckpt_root = os.path.join(cfg.get("output_dir", "./outputs"), "checkpoints")

    def run_validation(step, params, batch):
        """log_validation equivalent (`train_cogvideo_to2v.py:820-887,2057-2110`):
        sample with the current adapters via the To2V pipeline, write MP4s, and
        log wired quality metrics (vs the source video)."""
        from tokensgen_tpu.data.video_io import write_video
        from tokensgen_tpu.metrics.quality import evaluate_video
        from tokensgen_tpu.pipelines.to2v import To2VConfig, To2VPipeline

        pcfg = To2VConfig(
            height=height, width=width, num_frames_per_chunk=nf_px,
            num_inference_steps=min(cfg.get("num_inference_steps", 52),
                                    4 if args.smoke else 52),
            num_partitions=2 if args.smoke else 4, stochastic=False,
        )
        host_params = jax.device_get(params)
        dit_p = host_params["dit"]
        if "lora" in host_params:
            from tokensgen_tpu.train.lora import merge_lora

            dit_p = merge_lora(dit_p, host_params["lora"], tcfg.lora_rank,
                               tcfg.lora_alpha)
        pipe = To2VPipeline(pcfg, dcfg, {"params": dit_p}, rcfg,
                            {"params": host_params["resampler"]}, vae, sched)
        frames = jnp.asarray(batch["pixel_values"][:1])
        text = text_embeds_for(batch["prompt"][:1])
        out = pipe.generate(text, jnp.zeros_like(text), frames=frames,
                            num_chunks=frames.shape[1] // nf_px,
                            rng=jax.random.PRNGKey(step))
        vid = np.asarray(out["video"][0])
        write_video(os.path.join(run_dir, f"val_step{step}.mp4"), vid, fps=10)
        src = (np.asarray(frames[0, : vid.shape[0]]) + 1) / 2
        lpips_params = None
        if cfg.get("lpips_vgg_path") and cfg.get("lpips_lins_path"):
            from tokensgen_tpu.metrics.lpips import load_lpips_params

            lpips_params = load_lpips_params(
                cfg.get("lpips_vgg_path"), cfg.get("lpips_lins_path"))
        m = evaluate_video((vid + 1) / 2, src, lpips_params=lpips_params)
        for k, v in m.items():
            tb.scalar(f"val/{k}", v, step)
        print(f"validation step {step}: {m}", flush=True)

    from tokensgen_tpu.utils.logging import StepTimer, profile_trace

    timer = StepTimer()
    t_start = time.time()
    profiling = args.profile_steps > 0
    if profiling:
        import jax as _jax
        _jax.profiler.start_trace(os.path.join(run_dir, "profile"))
    for step in range(step0, max_steps):
        t_step = time.time()
        batch = next(batches)
        rng, r_stage, r_step = jax.random.split(rng, 3)
        staged = staging.stage_to2v_batch(
            dcfg, params["dit"], rcfg, vae,
            jnp.asarray(batch["pixel_values"]),
            batch["start_frame_idx"], batch["drop_image_embed"],
            text_embeds_for(batch["prompt"]), r_stage, nf_px=nf_px,
            host_rng=host_rng,
        )
        train_batch = {
            "latents": shard_batch(mesh, staged["latents"]),
            "vip_input_chunks": shard_batch(mesh, staged["vip_input_chunks"]),
            "vip_emb_sel": shard_batch(mesh, staged["vip_emb_sel"]),
            "resampler_image_rotary_emb": staged["resampler_image_rotary_emb"],
            "resampler_sampling_rotary_emb": staged["resampler_sampling_rotary_emb"],
            "text_embeds": shard_batch(mesh, staged["text_embeds"]),
            "image_rotary_emb": staged["image_rotary_emb"],
            "vip_image_rotary_emb": tuple(shard_batch(mesh, t) for t in staged["vip_image_rotary_emb"]),
            "vip_condition_rotary_emb": tuple(shard_batch(mesh, t) for t in staged["vip_condition_rotary_emb"]),
        }
        params, opt_state, metrics = train_step(params, opt_state, train_batch, r_step)
        loss = float(metrics["loss"])
        tb.scalar("train_loss", loss, step)
        dt = time.time() - t_step
        ema = timer.update(dt)
        # stall watchdog (SURVEY §5.3: the reference has none; a hung collective
        # or pathological recompile surfaces here instead of silently wedging)
        if step > step0 + 2 and dt > 5 * ema:
            print(f"WARNING: step {step} took {dt:.1f}s (EMA {ema:.1f}s) — "
                  "possible recompile or input stall", flush=True)
        if profiling and step - step0 + 1 >= args.profile_steps:
            import jax as _jax
            _jax.profiler.stop_trace()
            profiling = False
            print(f"profile trace written to {run_dir}/profile", flush=True)
        if step % 10 == 0:
            print(f"step {step}: loss {loss:.4f} "
                  f"({(time.time()-t_start)/(step-step0+1):.2f}s/step)", flush=True)
        if val_every and (step + 1) % val_every == 0:
            if val_items is not None:
                from tokensgen_tpu.data.mira import collate

                run_validation(step + 1, params, collate(val_items))
            else:
                run_validation(step + 1, params, batch)
        if (step + 1) % ckpt_every == 0 or step + 1 == max_steps:
            CK.save_checkpoint(
                ckpt_root, step + 1,
                {"params": jax.device_get(params), "opt_state": jax.device_get(opt_state)},
                total_limit=cfg.get("checkpoints_total_limit", 3),
            )
            print(f"checkpoint saved at step {step+1}", flush=True)
    if tcfg.lora_rank > 0:
        # export the MERGED weights (base + a@b * alpha/rank) so inference
        # loads a plain DiT tree — the reference's save_lora_weights +
        # fuse counterpart
        from tokensgen_tpu.train.lora import merge_lora

        host = jax.device_get(params)
        merged = merge_lora(host["dit"], host["lora"], tcfg.lora_rank,
                            tcfg.lora_alpha)
        CK.save_checkpoint(
            os.path.join(run_dir, "lora_merged"), max_steps,
            {"params": {"dit": merged, "resampler": host["resampler"]}},
            total_limit=1,
        )
        print(f"lora-merged export saved to {run_dir}/lora_merged", flush=True)
    tb.close()
    print("training done", flush=True)


if __name__ == "__main__":
    main()

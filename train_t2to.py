"""T2To training CLI — full-model finetune on PCA-compressed condensed tokens.

TPU-native counterpart of `accelerate launch train_cogvideo_t2to.py --config ...`
(`/root/reference/train_cogvideo_t2to.py`): consumes either precomputed VAE
latents (VAEMiraDataset path, `:1978-1992`) run through the frozen patch-proj +
resampler, or precomputed condensed tokens (VIPMiraDataset), normalises them with
the fitted PCA/mean/std, and finetunes the patch_size=1 DiT under the `vip_1`
schedule with padded-chunk attention/loss masks.
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
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed for multi-host TPU pods")
    args = ap.parse_args()

    import jax

    if args.multihost:
        # multi-host entry (SURVEY §7.2 item 8): one process per host, all hosts
        # run the same SPMD program; DCN coordination via jax.distributed
        jax.distributed.initialize()
    import jax.numpy as jnp

    from tokensgen_tpu.core import pca as pca_lib
    from tokensgen_tpu.core import schedule as S
    from tokensgen_tpu.models.dit import DiTConfig
    from tokensgen_tpu.sharding import MeshSpec, make_mesh, replicate, shard_batch
    from tokensgen_tpu.train import checkpoint as CK
    from tokensgen_tpu.train import t2to
    from tokensgen_tpu.utils.config import create_output_folders, load_config
    from tokensgen_tpu.utils.logging import TBLogger

    cfg = load_config(args.config)
    run_dir = create_output_folders(cfg.get("output_dir", "./outputs"),
                                    cfg.get("name_prefix", "t2to"), args.config)
    print(f"run dir: {run_dir}", flush=True)

    # parallel layout: mesh (data, model) — see train_to2v.py; tiny smoke uses
    # 1 head so TP there needs num_attention_heads >= tp (2 below)
    tp = int(cfg.get("tp_devices", 1))
    # `sp_devices`: Ulysses sequence parallelism (see train_to2v.py); mutually
    # exclusive with tp_devices — both use the mesh `model` axis
    sp = int(cfg.get("sp_devices", 1))
    if tp > 1 and sp > 1:
        raise ValueError("tp_devices and sp_devices are mutually exclusive")
    nmodel = max(tp, sp)
    ndev = jax.device_count()
    if nmodel < 1 or ndev % nmodel:
        raise ValueError(
            f"tp/sp devices={nmodel} must divide device count {ndev}")
    dp = int(cfg.get("dp_devices", 0)) or (ndev // nmodel)
    if dp * nmodel > ndev:
        raise ValueError(f"dp({dp}) x model({nmodel}) exceeds {ndev} devices")
    mesh = make_mesh(MeshSpec(data=dp, model=nmodel))
    if nmodel > 1:
        # ambient mesh BEFORE any model apply/init (head-sharded attention)
        jax.set_mesh(mesh)
        if tp > 1:
            print(f"tensor parallel: tp={tp} x dp={dp} mesh", flush=True)
        else:
            print(f"sequence parallel (Ulysses): sp={sp} x dp={dp} mesh",
                  flush=True)

    if args.smoke or cfg.get("model_size") == "tiny":
        dcfg = DiTConfig.tiny(patch_size=1, sample_height=8, sample_width=12,
                              attention_head_dim=64,
                              num_attention_heads=2 if nmodel > 1 else 1,
                              tp_axis="model" if tp > 1 else None,
                              sp_axis="model" if sp > 1 else None)
        max_chunks, tokens_per_chunk = 4, 4
        token_dim = 48
    else:
        dcfg = DiTConfig.t2to_5b(remat=True,
                                 tp_axis="model" if tp > 1 else None,
                                 sp_axis="model" if sp > 1 else None)
        max_chunks = cfg.get_path("train_data_params.max_num_chunks", 24)
        tokens_per_chunk = 4
        token_dim = 3072

    f = max_chunks * tokens_per_chunk
    b = cfg.get("per_gpu_batch_size", 1) * dp
    sched = S.make_schedule(S.ScheduleConfig(
        beta_schedule=cfg.get("beta_schedule", "vip_1")))
    tcfg = t2to.T2ToTrainConfig(
        learning_rate=cfg.get("learning_rate", 3e-4),
        optimizer=cfg.get("optimizer", "adamw"),
        use_8bit_adam=cfg.get("use_8bit_adam", False),
        lr_scheduler=cfg.get("lr_scheduler", "constant"),
        lr_warmup_steps=cfg.get("lr_warmup_steps", 0),
        lr_num_cycles=cfg.get("lr_num_cycles", 1),
        lr_power=cfg.get("lr_power", 1.0),
        max_train_steps=cfg.get("max_train_steps", 100),
        num_processes=dp,
        # LoRA finetune mode (reference peft path, default-off): freezes the
        # 5b clone and trains only the low-rank factors
        lora_rank=cfg.get("lora_rank", 0),
        lora_alpha=cfg.get("lora_alpha", 64.0),
        lora_targets=tuple(cfg.get("lora_targets",
                                   ["to_q", "to_k", "to_v", "to_out"])),
    )
    if cfg.get("scale_lr"):
        import dataclasses as _dc
        tcfg = _dc.replace(
            tcfg, learning_rate=tcfg.learning_rate
            * cfg.get("gradient_accumulation_steps", 1)
            * cfg.get("per_gpu_batch_size", 1) * dp)

    # PCA / mean / std (fit here in smoke mode; load converted artifacts otherwise)
    rng_np = np.random.default_rng(cfg.get("seed", 42))
    if args.smoke or not cfg.get("longvgen_pca"):
        pca = pca_lib.fit(jnp.asarray(rng_np.normal(size=(256, token_dim)), jnp.float32), None)
        mean = jnp.zeros((1, token_dim))
        std = jnp.ones((1, token_dim))
    else:
        from tokensgen_tpu.convert.torch_weights import load_pca_artifact

        pca = load_pca_artifact(cfg.longvgen_pca)
        mean = jnp.asarray(np.load(cfg.longvgen_mean))
        std = jnp.asarray(np.load(cfg.longvgen_std))

    # model init
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    from tokensgen_tpu.models.dit import CogVideoXTransformer

    dit = CogVideoXTransformer(dcfg)
    rope = get_3d_rotary_pos_embed_v2(
        dcfg.attention_head_dim, np.arange(f), np.arange(tcfg.height),
        np.arange(tcfg.width), dim_t=52, dim_h=6, dim_w=6)
    params = dit.init(
        jax.random.PRNGKey(cfg.get("seed", 42)),
        jnp.zeros((1, f, 16, tcfg.height, tcfg.width)),
        jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32), image_rotary_emb=rope,
    )["params"]
    if tcfg.lora_rank > 0:
        from tokensgen_tpu.train.lora import init_lora, lora_param_count

        lora = init_lora(params, jax.random.PRNGKey(cfg.get("seed", 42) + 1),
                         rank=tcfg.lora_rank, targets=tcfg.lora_targets)
        params = {"dit": params, "lora": lora}
        print(f"lora: rank={tcfg.lora_rank} alpha={tcfg.lora_alpha} "
              f"targets={list(tcfg.lora_targets)} "
              f"({lora_param_count(lora)/1e6:.2f}M params)", flush=True)

    optimizer = t2to.make_optimizer(
        tcfg, accum_steps=cfg.get("gradient_accumulation_steps", 1))
    opt_state = optimizer.init(params)
    step0 = 0
    ckpt_root = os.path.join(cfg.get("output_dir", "./outputs"), "t2to_checkpoints")
    if args.resume:
        restored, step0 = CK.restore_checkpoint(
            ckpt_root, target={"params": params, "opt_state": opt_state})
        if restored is not None:
            params, opt_state = restored["params"], restored["opt_state"]
        step0 = step0 or 0

    step_fn = jax.jit(t2to.make_train_step(dcfg, sched, tcfg, optimizer))
    if tp > 1:
        from tokensgen_tpu.sharding.tp import shard_dit_params

        if tcfg.lora_rank > 0:
            params = {"dit": shard_dit_params(mesh, params["dit"]),
                      "lora": replicate(mesh, params["lora"])}
        else:
            params = shard_dit_params(mesh, params)
    else:
        params = replicate(mesh, params)
    if cfg.get("zero1", False):
        from tokensgen_tpu.sharding.zero import shard_opt_state

        opt_state = shard_opt_state(opt_state, mesh)
    else:
        opt_state = replicate(mesh, opt_state)

    def synthetic_batches():
        while True:
            valid = rng_np.integers(1, max_chunks + 1, size=(b,)) * tokens_per_chunk
            yield {
                "latents": rng_np.normal(size=(b, f, 16, tcfg.height, tcfg.width)).astype(np.float32),
                "text_embeds": (rng_np.normal(size=(b, dcfg.max_text_seq_length, dcfg.text_embed_dim)) * 0.02).astype(np.float32),
                "valid_frames": valid,
            }

    from tokensgen_tpu.models.text_encoder import make_text_encoder

    text_encoder = make_text_encoder(
        cfg.get("pretrained_text_encoder_path"),
        dcfg.max_text_seq_length, dcfg.text_embed_dim,
        allow_hash_fallback=args.smoke,
    )

    if args.smoke or not cfg.get_path("train_data_params.csv_file"):
        batches = synthetic_batches()
    elif cfg.get_path("train_data_params.token_dir"):
        # precomputed condensed tokens (`VIPMiraDataset`, `:1964-1976`)
        from tokensgen_tpu.data import VIPMiraDataset, batch_iterator

        ds = VIPMiraDataset(
            cfg.get_path("train_data_params.csv_file"),
            cfg.get_path("train_data_params.token_dir"),
            max_num_chunks=max_chunks,
        )

        def real_batches():
            epoch = 0
            while True:
                for raw in batch_iterator(ds, b, seed=cfg.get("seed", 42) + epoch):
                    toks = jnp.asarray(raw["vip_tokens"])
                    lat = t2to.pca_normalization(toks, pca, mean, std)
                    yield {
                        "latents": lat,
                        "text_embeds": np.asarray(text_encoder(raw["prompt"])),
                        "valid_frames": raw["valid_num_chunks"] * tokens_per_chunk,
                    }
                epoch += 1

        batches = real_batches()
    else:
        # precomputed VAE latents -> frozen patch-proj + resampler
        # (`VAEMiraDataset` path, `train_cogvideo_t2to.py:1978-1992`)
        from tokensgen_tpu.data import VAEMiraDataset, batch_iterator
        from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
        from tokensgen_tpu.models.dit import DiTConfig as _DC
        from tokensgen_tpu.train.t2to import vip_encode_video_latents

        to2v_dcfg = DiTConfig.cogvideox_5b()
        rcfg = ResamplerConfig()
        # frozen encoder weights converted from TokensGen-To2V artifacts
        from tokensgen_tpu.convert.safetensors_io import load_safetensors
        from tokensgen_tpu.convert.torch_weights import convert_resampler

        rs_sd = load_safetensors(os.path.join(
            cfg.get("pretrained_resampler_name_or_path"),
            "resampler", "diffusion_flax_model.safetensors"))
        rs_params = {"params": convert_resampler(rs_sd, rcfg.depth)}
        pp_sd = load_safetensors(cfg.get("patch_embed_proj_path"))
        patch_proj_params = {"conv": {
            "kernel": pp_sd["proj.weight"].transpose(2, 3, 1, 0),
            "bias": pp_sd["proj.bias"],
        }} if "proj.weight" in pp_sd else None

        ds = VAEMiraDataset(
            cfg.get_path("train_data_params.csv_file"),
            cfg.get_path("train_data_params.latent_dir"),
            max_num_chunks=max_chunks,
        )

        def real_batches():
            epoch = 0
            while True:
                for raw in batch_iterator(ds, b, seed=cfg.get("seed", 42) + epoch):
                    toks = vip_encode_video_latents(
                        to2v_dcfg, {"patch_proj": patch_proj_params},
                        rcfg, rs_params, jnp.asarray(raw["vae_latents"]))
                    lat = t2to.pca_normalization(toks, pca, mean, std)
                    yield {
                        "latents": lat,
                        "text_embeds": np.asarray(text_encoder(raw["prompt"])),
                        "valid_frames": raw["valid_num_chunks"] * tokens_per_chunk,
                    }
                epoch += 1

        batches = real_batches()

    tb = TBLogger(run_dir)
    rng = jax.random.PRNGKey(cfg.get("seed", 42))
    max_steps = args.max_steps or cfg.get("max_train_steps", 100)
    t0 = time.time()
    for step in range(step0, max_steps):
        batch = next(batches)
        batch = {
            "latents": shard_batch(mesh, jnp.asarray(batch["latents"])),
            "text_embeds": shard_batch(mesh, jnp.asarray(batch["text_embeds"])),
            "valid_frames": shard_batch(mesh, jnp.asarray(batch["valid_frames"])),
        }
        rng, key = jax.random.split(rng)
        params, opt_state, metrics = step_fn(params, opt_state, batch, key)
        loss = float(metrics["loss"])
        tb.scalar("train_loss", loss, step)
        if step % 10 == 0:
            print(f"step {step}: loss {loss:.4f} "
                  f"({(time.time()-t0)/(step-step0+1):.2f}s/step)", flush=True)
        if (step + 1) % cfg.get("checkpointing_steps", 500) == 0 or step + 1 == max_steps:
            CK.save_checkpoint(ckpt_root, step + 1,
                               {"params": jax.device_get(params),
                                "opt_state": jax.device_get(opt_state)},
                               total_limit=cfg.get("checkpoints_total_limit", 3))
    if tcfg.lora_rank > 0:
        from tokensgen_tpu.train.lora import merge_lora

        host = jax.device_get(params)
        merged = merge_lora(host["dit"], host["lora"], tcfg.lora_rank,
                            tcfg.lora_alpha)
        CK.save_checkpoint(os.path.join(run_dir, "lora_merged"), max_steps,
                           {"params": merged}, total_limit=1)
        print(f"lora-merged export saved to {run_dir}/lora_merged", flush=True)
    tb.close()
    print("training done", flush=True)


if __name__ == "__main__":
    main()

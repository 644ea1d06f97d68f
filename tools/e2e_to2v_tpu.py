"""Production-size To2V edit pipeline end-to-end on one TPU chip.

Runs the REAL 7.17B model at the real 720x480/49-frame shapes with random
weights (no checkpoint exists in this environment) through the full edit
workload: VAE encode -> patch-proj -> resampler -> CFG base denoise -> FIFO
long-video loop -> VAE decode. Reduced step count / chunk count so the run
finishes in minutes; every jitted program is the production program.

Usage: python tools/e2e_to2v_tpu.py [steps] [chunks] [partitions] [layers]

Depth defaults to 36 (of 42): the full-depth FIFO phase needs ~16.3 GB
(DiT 14.3 + B=2 activations + queue/track buffers) and crashed the 16 GB
chip's worker when tried; 36 layers leaves ~2 GB headroom while every
per-layer program (attention kernels, sequence lengths, CFG batching) is the
production one. Full depth fits on >=24 GB parts (v5p/v6e) or 2 chips.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.models.dit import (
    CogVideoXTransformer, DiTConfig, VIPConfig, graft_vip_params,
)
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner
from tokensgen_tpu.pipelines.to2v import To2VConfig, To2VPipeline
from tokensgen_tpu.utils.params import init_params_bf16, param_count


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    layers = int(sys.argv[4]) if len(sys.argv) > 4 else 36
    ff_chunks = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    # full depth only fits the 16 GB part with sequential-CFG forwards
    seq_cfg = (int(sys.argv[6]) if len(sys.argv) > 6 else
               (1 if layers > 36 else 0))
    # per-step host dispatch: bounds single-program wall time (the tunneled
    # runtime killed the 42-layer multi-minute scan programs) + progress
    host_loop = (int(sys.argv[7]) if len(sys.argv) > 7 else
                 (1 if layers > 36 else 0))
    # phase offload is only needed when the params don't all fit HBM; at
    # reduced depth it just pays ~100 s/GB of tunnel host-transfer each way
    offload = (int(sys.argv[8]) if len(sys.argv) > 8 else
               (1 if layers > 24 else 0))

    # argv[9]: run the REAL T5-XXL prompt-encode phase (default on) — the
    # pipeline stage the reference runs at `pipeline_cogvideox_mp_fifo.py:
    # 365-486`; 4.76B params bf16 live alone on the chip, then are freed
    # before the VAE/DiT phases (the offload orchestration's phase 0)
    use_t5 = int(sys.argv[9]) if len(sys.argv) > 9 else 1

    cfg = To2VConfig(
        height=480, width=720, num_frames_per_chunk=49,
        num_inference_steps=steps, num_partitions=parts, stochastic=False,
        fifo_emit_dtype="bfloat16",  # halves the emitted-frame stack
        sequential_cfg=bool(seq_cfg),
    )
    vc = VIPConfig()
    dcfg = DiTConfig.cogvideox_5b(vip=vc, ff_chunks=ff_chunks, num_layers=layers)
    rcfg = ResamplerConfig()
    vcfg = VAEConfig.cogvideox(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(key, 3)

    t0 = time.time()

    # --- phase 0: T5-XXL prompt encode (then freed) ---
    if use_t5:
        from tokensgen_tpu.models.t5 import T5Config, T5Encoder

        t5cfg = T5Config.xxl()
        t5 = T5Encoder(t5cfg)
        t5_params = init_params_bf16(
            t5.init, jax.random.PRNGKey(11),
            jnp.zeros((1, 226), jnp.int32), jnp.ones((1, 226), bool))
        n5 = param_count(t5_params)
        rng_ids = np.random.default_rng(7)
        ids = jnp.asarray(rng_ids.integers(3, 32000, size=(1, 226)), jnp.int32)
        mask = jnp.asarray(np.ones((1, 226), bool))
        neg_ids = jnp.zeros((1, 226), jnp.int32)  # all-pad "" prompt
        neg_mask = jnp.asarray(
            np.arange(226)[None, :] < 1)  # eos only attended
        t5_fwd = jax.jit(lambda p, i, m: t5.apply(p, i, m))
        t1 = time.time()
        text_host = np.asarray(t5_fwd(t5_params, ids, mask).astype(jnp.float32))
        neg_host = np.asarray(
            t5_fwd(t5_params, neg_ids, neg_mask).astype(jnp.float32))
        print(f"[{time.time()-t0:7.1f}s] T5-XXL prompt encode: "
              f"{n5/1e9:.2f}B params, 2 prompts in {time.time()-t1:.1f}s "
              "(incl. compile)", flush=True)
        del t5_params  # frees ~9.5 GB before the VAE/DiT phases
    else:
        rng_ids = np.random.default_rng(7)
        text_host = (rng_ids.normal(size=(1, 226, 4096)) * 0.02).astype(np.float32)
        neg_host = np.zeros_like(text_host)

    vae_model = AutoencoderKLCogVideoX(vcfg)
    vae_params = init_params_bf16(
        vae_model.init, r1, jnp.zeros((1, 9, 480, 720, 3), jnp.bfloat16))
    vae_runner = VAERunner(vcfg, vae_params)

    rs = Resampler(rcfg)
    rs_params = init_params_bf16(
        rs.init, r2, jnp.zeros((1, cfg.nf_latent, 2, rcfg.embedding_dim),
                               jnp.bfloat16))

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2

    dit = CogVideoXTransformer(dcfg)
    d = dcfg.attention_head_dim
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(13), np.arange(30), np.arange(45))
    # init the 14.3 GB DiT tree ON HOST when offloading: the pipeline's phase
    # orchestration keeps a host master, so host-born params mean the first
    # phase move is a rebind instead of a 14.3 GB D2H (which runs at
    # 0.02 GB/s through the axon tunnel — tens of minutes)
    import contextlib
    init_dev = (jax.default_device(jax.devices("cpu")[0]) if offload
                else contextlib.nullcontext())
    with init_dev:
        dit_params = init_params_bf16(
            dit.init, r3,
            jnp.zeros((1, 13, 16, 60, 90), jnp.bfloat16),
            jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim), jnp.bfloat16),
            jnp.zeros((1,), jnp.int32),
            vip_hidden_states=jnp.zeros((1, 5, 3072, 8, 12), jnp.bfloat16),
            image_rotary_emb=rope,
            vip_image_rotary_emb=rope,
            vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(
                d, np.arange(5), np.arange(8), np.arange(12)),
        )
        dit_params = {"params": graft_vip_params(dit_params["params"], dcfg)}
    n = param_count(dit_params) + param_count(rs_params) + param_count(vae_params)
    print(f"[{time.time()-t0:7.1f}s] params ready: {n/1e9:.2f}B total", flush=True)

    sched = S.make_schedule(S.ScheduleConfig())
    pipe = To2VPipeline(cfg, dcfg, dit_params, rcfg, rs_params, vae_runner, sched)
    # the pipeline's offload orchestration frees HBM by re-binding its param
    # trees — drop the script-local references or the buffers stay alive
    del dit_params, rs_params, vae_params

    rng = np.random.default_rng(0)
    # host-resident source video: vip_encode_video ships one 49-frame chunk
    # at a time to HBM (a device-resident 98-frame buffer costs ~200 MB of
    # the full-depth budget)
    frames = rng.uniform(-1, 1, size=(1, chunks * 49, 480, 720, 3)).astype(np.float32)
    text = jnp.asarray(text_host, jnp.bfloat16)
    neg = jnp.asarray(neg_host, jnp.bfloat16)

    t1 = time.time()
    out = pipe.generate(text, neg, frames=frames, num_chunks=chunks,
                        rng=jax.random.PRNGKey(2), offload_vae=bool(offload),
                        host_loop=bool(host_loop))
    video = np.asarray(out["video"].astype(jnp.float32))
    dt = time.time() - t1
    print(f"[{time.time()-t0:7.1f}s] EDIT E2E OK (incl. compile): "
          f"{dt:.1f}s -> video {video.shape}, finite={np.isfinite(video).all()}, "
          f"std={video.std():.3f}", flush=True)
    # free run-1's device-resident outputs (video/orig_video/cache decodes,
    # several hundred MB of HBM) before the warm run — at full depth the
    # chip has ~60 MB of slack and holding them OOMs the second pass
    del out

    # warm second run = the production-rate number
    t2 = time.time()
    out = pipe.generate(text, neg, frames=frames, num_chunks=chunks,
                        rng=jax.random.PRNGKey(3), offload_vae=bool(offload),
                        host_loop=bool(host_loop))
    float(jnp.sum(out["video"].astype(jnp.float32)))
    dt2 = time.time() - t2
    nf = chunks * 49
    print(f"warm edit run ({layers} layers, seq_cfg={seq_cfg}): {dt2:.1f}s for "
          f"{nf} frames at {steps} steps, {parts} partition(s) -> "
          f"{nf/dt2:.2f} frames/s end-to-end", flush=True)
    assert np.isfinite(video).all()


if __name__ == "__main__":
    main()

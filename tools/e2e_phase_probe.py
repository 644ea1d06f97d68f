"""Phase-isolated full-depth e2e probe: which program kills the TPU worker?

Runs the production To2V edit phases ONE AT A TIME with hard blocking between
them (encode -> base denoise -> FIFO -> decode) so the faulting program is
unambiguous (async dispatch otherwise surfaces every fault at the next
block_until_ready). Same construction as tools/e2e_to2v_tpu.py.

Usage: python tools/e2e_phase_probe.py [steps=16] [chunks=2] [layers=42]
       [ff_chunks=8] [seq_cfg=1] [host_loop=1]
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
from tokensgen_tpu.sampling import fifo as fifo_engine
from tokensgen_tpu.utils.params import init_params_bf16, param_count


def mark(msg, t0):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    layers = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    ff_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    seq_cfg = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    host_loop = bool(int(sys.argv[6])) if len(sys.argv) > 6 else True

    cfg = To2VConfig(
        height=480, width=720, num_frames_per_chunk=49,
        num_inference_steps=steps, num_partitions=1, stochastic=False,
        fifo_emit_dtype="bfloat16", sequential_cfg=bool(seq_cfg),
    )
    vc = VIPConfig()
    dcfg = DiTConfig.cogvideox_5b(vip=vc, ff_chunks=ff_chunks, num_layers=layers)
    rcfg = ResamplerConfig()
    vcfg = VAEConfig.cogvideox(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(key, 3)
    t0 = time.time()

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
    # host-side init: the encode phase parks the DiT on host anyway, and a
    # host-born tree turns that first move into a rebind instead of a
    # 14.3 GB D2H through the 0.02 GB/s tunnel
    with jax.default_device(jax.devices("cpu")[0]):
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
    mark(f"params ready: {(param_count(dit_params))/1e9:.2f}B DiT", t0)

    sched = S.make_schedule(S.ScheduleConfig())
    pipe = To2VPipeline(cfg, dcfg, dit_params, rcfg, rs_params, vae_runner, sched)
    del dit_params, rs_params, vae_params

    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, size=(1, chunks * 49, 480, 720, 3)).astype(np.float32)
    text = jnp.asarray(rng.normal(size=(1, 226, 4096)) * 0.02, jnp.bfloat16)
    neg = jnp.zeros_like(text)

    # ---- phase E: encode (DiT on host, VAE+resampler on device) ----
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    pipe.dit_params = jax.device_put(pipe.dit_params, cpu)
    emb = pipe.vip_encode_video(frames, rng=jax.random.PRNGKey(7))
    jax.block_until_ready(emb)
    mark(f"PHASE E (vae encode + resampler) OK: emb {emb.shape}", t0)

    # ---- phase B: base denoise (DiT on device, VAE on host) ----
    pipe.vae.offload_to_host()
    pipe.resampler_params = jax.device_put(pipe.resampler_params, cpu)
    pipe.dit_params = jax.device_put(pipe.dit_params, dev)
    res, image_rope, model_fn = pipe.base_denoise(
        text, neg, emb, chunks, jax.random.PRNGKey(8), host_loop=host_loop)
    jax.block_until_ready(res.latents)
    jax.block_until_ready(res.fifo_latents)
    mark(f"PHASE B (base denoise, {layers}L, seq_cfg={seq_cfg}) OK: "
         f"{res.latents.shape}", t0)

    # ---- phase F: FIFO loop ----
    seed = pipe.fifo_seed(res, image_rope, emb, chunks)
    fcfg = fifo_engine.FIFOConfig(
        nf_per_chunk=cfg.nf_latent, num_partitions=cfg.num_partitions,
        num_inference_steps=steps, num_frames=chunks * cfg.nf_latent,
        guidance_scale=cfg.guidance_scale, stochastic=False,
        emit_dtype="bfloat16",
        vip_rope_dims=(dcfg.attention_head_dim // 4,
                       dcfg.attention_head_dim // 8 * 3,
                       dcfg.attention_head_dim // 8 * 3),
    )
    fres = fifo_engine.fifo_generate(
        model_fn, {"params": pipe.dit_params["params"]}, sched, fcfg, seed,
        rng=jax.random.PRNGKey(9), host_loop=host_loop)
    jax.block_until_ready(fres.latents)
    mark(f"PHASE F (FIFO {fcfg.num_iterations} iters) OK: {fres.latents.shape}",
         t0)

    # ---- phase D: decode ----
    pipe.dit_params = jax.device_put(pipe.dit_params, cpu)
    pipe.vae.restore_to_device()
    video = pipe.decode_latents(fres.latents)
    v = np.asarray(video.astype(jnp.float32))
    mark(f"PHASE D (decode) OK: {v.shape} finite={np.isfinite(v).all()} "
         f"std={v.std():.3f}", t0)
    print("ALL PHASES OK", flush=True)


if __name__ == "__main__":
    main()

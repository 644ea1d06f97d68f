"""w8a8 full-depth drift study (VERDICT r3 item 3).

Runs the production To2V edit e2e TWICE on one chip — bf16 vs `quant: w8a8`
over the SAME weights, identical seeds/noise — and reports error propagation
through 42 layers x N DPM steps x FIFO recycling:

* latent MSE (relative to bf16 latent variance) per emitted FIFO iteration,
* decoded PSNR per emitted frame between the two videos,
* base-clip (orig) decoded PSNR — the plain N-step denoise drift.

Random weights are fine for numerics (the question is quantization error
growth, not sample quality). Reference workload being mirrored:
`cogvideo_sampling_mp_fifo.py:492-550`.

Usage: python tools/drift_w8a8.py [steps] [chunks] [layers] [ff_chunks]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from tokensgen_tpu.utils.platform import apply_platform_env

apply_platform_env()  # honor JAX_PLATFORMS=cpu for tiny-config validation runs

import jax
import jax.numpy as jnp
import numpy as np

from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.models.dit import (
    CogVideoXTransformer, DiTConfig, VIPConfig, graft_vip_params,
    quantize_dit_params,
)
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner
from tokensgen_tpu.pipelines.to2v import To2VConfig, To2VPipeline
from tokensgen_tpu.utils.params import init_params_bf16, param_count


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR on [-1,1]-range videos (peak-to-peak 2.0)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(4.0 / mse)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    layers = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    ff_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    cfg = To2VConfig(
        height=480, width=720, num_frames_per_chunk=49,
        num_inference_steps=steps, num_partitions=1, stochastic=False,
        fifo_emit_dtype="bfloat16",
        sequential_cfg=layers > 36,
    )
    vc = VIPConfig()
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

    d = 64
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(13), np.arange(30), np.arange(45))
    # host-born master tree: both arms derive from THIS tree (w8a8 quantizes
    # the same weights), and phase offload rebinding needs a host master
    dcfg0 = DiTConfig.cogvideox_5b(vip=vc, ff_chunks=ff_chunks, num_layers=layers)
    with jax.default_device(jax.devices("cpu")[0]):
        dit0 = CogVideoXTransformer(dcfg0)
        master = init_params_bf16(
            dit0.init, r3,
            jnp.zeros((1, 13, 16, 60, 90), jnp.bfloat16),
            jnp.zeros((1, dcfg0.max_text_seq_length, dcfg0.text_embed_dim), jnp.bfloat16),
            jnp.zeros((1,), jnp.int32),
            vip_hidden_states=jnp.zeros((1, 5, 3072, 8, 12), jnp.bfloat16),
            image_rotary_emb=rope,
            vip_image_rotary_emb=rope,
            vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(
                d, np.arange(5), np.arange(8), np.arange(12)),
        )
        master = {"params": graft_vip_params(master["params"], dcfg0)}
    print(f"[{time.time()-t0:7.1f}s] master params ready: "
          f"{param_count(master)/1e9:.2f}B", flush=True)

    sched = S.make_schedule(S.ScheduleConfig())
    rng_src = np.random.default_rng(0)
    frames = rng_src.uniform(
        -1, 1, size=(1, chunks * 49, 480, 720, 3)).astype(np.float32)
    text = jnp.asarray(rng_src.normal(size=(1, 226, 4096)) * 0.02, jnp.bfloat16)
    neg = jnp.zeros_like(text)

    results = {}
    for arm in ("bf16", "w8a8"):
        import dataclasses as dc

        dcfg = dc.replace(dcfg0, quant=None if arm == "bf16" else "w8a8")
        with jax.default_device(jax.devices("cpu")[0]):
            params = (master if arm == "bf16"
                      else {"params": quantize_dit_params(master["params"], dcfg)})
        pipe = To2VPipeline(cfg, dcfg, params, rcfg, rs_params, vae_runner, sched)
        del params
        t1 = time.time()
        out = pipe.generate(text, neg, frames=frames, num_chunks=chunks,
                            rng=jax.random.PRNGKey(2), offload_vae=True,
                            host_loop=True)
        results[arm] = {
            "latents": np.asarray(out["latents"].astype(jnp.float32)),
            "video": np.asarray(out["video"].astype(jnp.float32)),
            "orig": np.asarray(out["orig_video"].astype(jnp.float32)),
        }
        print(f"[{time.time()-t0:7.1f}s] {arm} run: {time.time()-t1:.1f}s, "
              f"latents {results[arm]['latents'].shape}", flush=True)
        del out, pipe

    # emitted clean frames [B, num_frames, C, H, W]: frame i was popped at
    # FIFO iteration i (post warm-up) -> per-iteration drift series
    lb = results["bf16"]["latents"][0]
    lq = results["w8a8"]["latents"][0]
    lb = lb.reshape(lb.shape[0], -1)
    lq = lq.reshape(lq.shape[0], -1)
    var = float(np.var(results["bf16"]["latents"]))
    rel_mse = [float(np.mean((a - b) ** 2)) / max(var, 1e-12)
               for a, b in zip(lb, lq)]
    vb, vq = results["bf16"]["video"][0], results["w8a8"]["video"][0]
    frame_psnr = [psnr(vb[i], vq[i]) for i in range(vb.shape[0])]
    orig_psnr = psnr(results["bf16"]["orig"], results["w8a8"]["orig"])

    print("\n=== w8a8 drift vs bf16 (same weights, same noise) ===", flush=True)
    print(f"steps={steps} chunks={chunks} layers={layers}")
    print(f"base-clip ({steps}-step denoise) decoded PSNR: {orig_psnr:.2f} dB")
    print("per-FIFO-iteration relative latent MSE "
          "(emitted frame i vs bf16 variance):")
    for i in range(0, len(rel_mse), max(1, len(rel_mse) // 16)):
        print(f"  iter {i:3d}: rel MSE {rel_mse[i]:.4f}   "
              f"decoded PSNR {frame_psnr[min(i, len(frame_psnr)-1)]:.2f} dB")
    print(f"  last   : rel MSE {rel_mse[-1]:.4f}   "
          f"decoded PSNR {frame_psnr[-1]:.2f} dB")
    summary = {
        "steps": steps, "chunks": chunks, "layers": layers,
        "orig_psnr_db": orig_psnr,
        "rel_latent_mse_first": rel_mse[0], "rel_latent_mse_last": rel_mse[-1],
        "rel_latent_mse_max": max(rel_mse),
        "frame_psnr_min": min(frame_psnr), "frame_psnr_mean":
            float(np.mean(frame_psnr)),
    }
    print("DRIFT_SUMMARY " + json.dumps(summary), flush=True)
    out_path = f"/tmp/drift_w8a8_s{steps}_c{chunks}_l{layers}.json"
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "rel_mse": rel_mse,
                   "frame_psnr": frame_psnr}, f)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()

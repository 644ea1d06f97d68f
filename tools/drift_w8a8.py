"""w8a8 full-depth drift study (VERDICT r3 item 3).

Runs the production To2V edit e2e twice on one chip — bf16 vs `quant: w8a8`
over the SAME weights, identical seeds/noise — and reports error propagation
through 42 layers x N DPM steps x FIFO recycling:

* latent MSE (relative to bf16 latent variance) per emitted FIFO iteration,
* base-clip (N-step denoise) relative latent MSE,
* decoded PSNR when --decode is given (rebuilds the seed-deterministic VAE).

Random weights are fine for numerics (the question is quantization error
growth, not sample quality). Reference workload being mirrored:
`cogvideo_sampling_mp_fifo.py:492-550`.

The two arms run as SEPARATE processes: the bf16 arm's 14.3 GB resident DiT
leaves ~10 MB of HBM headroom on a 16 GB v5e, and allocator fragmentation
over ~50 host-loop iterations killed single-process runs twice. Each arm
checkpoints its emitted-frame series to disk after every FIFO iteration
(`emit_callback`), so a mid-run failure still yields the drift curve up to
that point.

Usage:
  python tools/drift_w8a8.py run bf16  [steps] [chunks] [layers] [ff_chunks]
  python tools/drift_w8a8.py run w8a8  [steps] [chunks] [layers] [ff_chunks]
  python tools/drift_w8a8.py compare   [steps] [chunks] [layers]
  python tools/drift_w8a8.py run-base {bf16,w8a8} [steps] [chunks] [layers]
  python tools/drift_w8a8.py compare-base         [steps] [chunks] [layers]

`run-base`/`compare-base` probe the plain N-step base denoise (no FIFO) —
the VERDICT item's second workload, e.g. the reference's 52-step DPM run.
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

import numpy as np

OUT_DIR = "/tmp/drift4"


def tag(steps, chunks, layers):
    return f"s{steps}_c{chunks}_l{layers}"


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR on [-1,1]-range videos (peak-to-peak 2.0)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(4.0 / mse)


def build(arm, steps, chunks, layers, ff_chunks, want_vae=True):
    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.core import schedule as S
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    from tokensgen_tpu.models.dit import (
        CogVideoXTransformer, DiTConfig, VIPConfig, graft_vip_params,
        quantize_dit_params,
    )
    from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
    from tokensgen_tpu.models.vae3d import (
        AutoencoderKLCogVideoX, VAEConfig, VAERunner)
    from tokensgen_tpu.pipelines.to2v import To2VConfig, To2VPipeline
    from tokensgen_tpu.utils.params import init_params_bf16, param_count

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

    import dataclasses as dc

    dcfg = dc.replace(dcfg0, quant=None if arm == "bf16" else "w8a8")
    with jax.default_device(jax.devices("cpu")[0]):
        params = (master if arm == "bf16"
                  else {"params": quantize_dit_params(master["params"], dcfg)})
    pipe = To2VPipeline(cfg, dcfg, params, rcfg, rs_params, vae_runner, sched)
    return pipe, frames, text, neg, t0


def run_arm(arm, steps, chunks, layers, ff_chunks):
    import jax

    os.makedirs(OUT_DIR, exist_ok=True)
    prefix = os.path.join(OUT_DIR, f"{arm}_{tag(steps, chunks, layers)}")
    pipe, frames, text, neg, t0 = build(arm, steps, chunks, layers, ff_chunks)

    em_series = []

    def on_emit(i, em_np):
        em_series.append(em_np.astype(np.float32))
        # rewrite the whole partial series each iteration (~2 MB * iters):
        # a crash at any point leaves the curve up to that iteration
        np.save(prefix + "_em_partial.npy", np.stack(em_series))
        if i % 5 == 0:
            print(f"[{time.time()-t0:7.1f}s] fifo iter {i} landed", flush=True)

    t1 = time.time()
    out = pipe.generate(text, neg, frames=frames, num_chunks=chunks,
                        rng=jax.random.PRNGKey(2), offload_vae=True,
                        host_loop=True, decode=False, emit_callback=on_emit)
    # host-side casts only: with the DiT resident, HBM has no headroom for
    # even a small device-side astype/transfer staging buffer at this point
    np.savez(prefix + ".npz",
             latents=np.asarray(out["latents"]).astype(np.float32),
             orig_latents=np.asarray(out["orig_latents"]).astype(np.float32))
    print(f"[{time.time()-t0:7.1f}s] {arm} run: {time.time()-t1:.1f}s  "
          f"-> {prefix}.npz", flush=True)


def run_base(arm, steps, chunks, layers, ff_chunks):
    """bf16-vs-w8a8 drift through the plain N-step base denoise (no FIFO)."""
    import jax

    os.makedirs(OUT_DIR, exist_ok=True)
    prefix = os.path.join(OUT_DIR, f"base_{arm}_{tag(steps, chunks, layers)}")
    pipe, frames, text, neg, t0 = build(arm, steps, chunks, layers, ff_chunks)
    t1 = time.time()
    out = pipe.generate(text, neg, frames=frames, num_chunks=chunks,
                        rng=jax.random.PRNGKey(2), offload_vae=True,
                        host_loop=True, decode=False, skip_fifo=True)
    np.save(prefix + ".npy",
            np.asarray(out["orig_latents"]).astype(np.float32))
    print(f"[{time.time()-t0:7.1f}s] {arm} base-denoise run: "
          f"{time.time()-t1:.1f}s  -> {prefix}.npy", flush=True)


def compare_base(steps, chunks, layers):
    pb = os.path.join(OUT_DIR, f"base_bf16_{tag(steps, chunks, layers)}.npy")
    pq = os.path.join(OUT_DIR, f"base_w8a8_{tag(steps, chunks, layers)}.npy")
    ob, oq = np.load(pb), np.load(pq)
    rel = float(np.mean((ob - oq) ** 2)) / max(float(np.var(ob)), 1e-12)
    summary = {"steps": steps, "chunks": chunks, "layers": layers,
               "base_rel_latent_mse": rel}
    print(f"base {steps}-step denoise rel latent MSE (w8a8 vs bf16): {rel:.6f}")
    print("DRIFT_BASE_SUMMARY " + json.dumps(summary), flush=True)
    out_path = os.path.join(
        OUT_DIR, f"drift_base_w8a8_{tag(steps, chunks, layers)}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f)
    print(f"wrote {out_path}", flush=True)


def load_arm(arm, steps, chunks, layers):
    """Return (em_series [iters,B,C,H,W], orig_latents|None, complete)."""
    prefix = os.path.join(OUT_DIR, f"{arm}_{tag(steps, chunks, layers)}")
    if os.path.exists(prefix + ".npz"):
        z = np.load(prefix + ".npz")
        em = np.load(prefix + "_em_partial.npy")
        return em, z["orig_latents"], True
    if os.path.exists(prefix + "_em_partial.npy"):
        return np.load(prefix + "_em_partial.npy"), None, False
    raise FileNotFoundError(f"no drift output for arm {arm} at {prefix}*")


def compare(steps, chunks, layers, decode=False):
    eb, ob, cb = load_arm("bf16", steps, chunks, layers)
    eq, oq, cq = load_arm("w8a8", steps, chunks, layers)
    n = min(eb.shape[0], eq.shape[0])
    print(f"bf16 iters={eb.shape[0]} (complete={cb})  "
          f"w8a8 iters={eq.shape[0]} (complete={cq})  comparing first {n}")
    var = float(np.var(eb[:n]))
    rel_mse = [float(np.mean((eb[i] - eq[i]) ** 2)) / max(var, 1e-12)
               for i in range(n)]
    summary = {
        "steps": steps, "chunks": chunks, "layers": layers,
        "iters_compared": n,
        "bf16_complete": cb, "w8a8_complete": cq,
        "rel_latent_mse_first": rel_mse[0], "rel_latent_mse_last": rel_mse[-1],
        "rel_latent_mse_max": max(rel_mse),
    }
    if ob is not None and oq is not None:
        ovar = float(np.var(ob))
        summary["orig_rel_latent_mse"] = float(
            np.mean((ob - oq) ** 2)) / max(ovar, 1e-12)
    frame_psnr = None
    if decode:
        # rebuild the seed-deterministic VAE on the current backend and
        # decode both emitted series (warm-up frames dropped) for PSNR
        import jax
        import jax.numpy as jnp

        from tokensgen_tpu.models.vae3d import (
            AutoencoderKLCogVideoX, VAEConfig, VAERunner)
        from tokensgen_tpu.utils.params import init_params_bf16

        vcfg = VAEConfig.cogvideox(dtype=jnp.bfloat16)
        r1 = jax.random.split(jax.random.PRNGKey(0), 3)[0]
        vae_model = AutoencoderKLCogVideoX(vcfg)
        vae_params = init_params_bf16(
            vae_model.init, r1, jnp.zeros((1, 9, 480, 720, 3), jnp.bfloat16))
        runner = VAERunner(vcfg, vae_params)
        nf = 13
        warm = steps - nf
        vids = {}
        for name, em in (("bf16", eb), ("w8a8", eq)):
            lat = em[warm:n].transpose(1, 0, 2, 3, 4)  # [B, F, C, h, w]
            t_use = (lat.shape[1] // nf) * nf
            if t_use == 0:
                print("decode: not enough post-warm-up frames; skipping")
                break
            # mirror To2VPipeline.decode_latents: unscale, channels-last,
            # chunked causal decode
            z = jnp.asarray(lat[:, :t_use]) / vcfg.scaling_factor
            z = z.transpose(0, 1, 3, 4, 2)
            parts = [runner.decode(z[:, s:s + nf])
                     for s in range(0, t_use, nf)]
            vids[name] = np.asarray(jnp.concatenate(parts, axis=1))
        if len(vids) == 2:
            vb, vq = vids["bf16"][0], vids["w8a8"][0]
            frame_psnr = [psnr(vb[i], vq[i]) for i in range(vb.shape[0])]
            summary["frame_psnr_min"] = min(frame_psnr)
            summary["frame_psnr_mean"] = float(np.mean(frame_psnr))

    print("\n=== w8a8 drift vs bf16 (same weights, same noise) ===", flush=True)
    print(f"steps={steps} chunks={chunks} layers={layers}")
    if "orig_rel_latent_mse" in summary:
        print(f"base-clip ({steps}-step denoise) rel latent MSE: "
              f"{summary['orig_rel_latent_mse']:.5f}")
    print("per-FIFO-iteration relative latent MSE (emitted frame i):")
    for i in range(0, n, max(1, n // 16)):
        extra = (f"   decoded PSNR {frame_psnr[i - (steps - 13)]:.2f} dB"
                 if frame_psnr and 0 <= i - (steps - 13) < len(frame_psnr)
                 else "")
        print(f"  iter {i:3d}: rel MSE {rel_mse[i]:.5f}{extra}")
    print(f"  last   : rel MSE {rel_mse[-1]:.5f}")
    print("DRIFT_SUMMARY " + json.dumps(summary), flush=True)
    out_path = os.path.join(
        OUT_DIR, f"drift_w8a8_{tag(steps, chunks, layers)}.json")
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "rel_mse": rel_mse,
                   "frame_psnr": frame_psnr}, f)
    print(f"wrote {out_path}", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if mode == "run":
        arm = sys.argv[2]
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 13
        chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 2
        layers = int(sys.argv[5]) if len(sys.argv) > 5 else 42
        ff_chunks = int(sys.argv[6]) if len(sys.argv) > 6 else 8
        run_arm(arm, steps, chunks, layers, ff_chunks)
    elif mode == "run-base":
        arm = sys.argv[2]
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 52
        chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        layers = int(sys.argv[5]) if len(sys.argv) > 5 else 42
        ff_chunks = int(sys.argv[6]) if len(sys.argv) > 6 else 8
        run_base(arm, steps, chunks, layers, ff_chunks)
    elif mode == "compare-base":
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 52
        chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        layers = int(sys.argv[4]) if len(sys.argv) > 4 else 42
        compare_base(steps, chunks, layers)
    elif mode == "compare":
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 13
        chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        layers = int(sys.argv[4]) if len(sys.argv) > 4 else 42
        compare(steps, chunks, layers, decode="--decode" in sys.argv)
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()

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
  python tools/drift_w8a8.py run bf16  [steps] [chunks] [layers] [ff_chunks] [parts] [stoch]
  python tools/drift_w8a8.py run w8a8  [steps] [chunks] [layers] [ff_chunks] [parts] [stoch]
  python tools/drift_w8a8.py compare   [steps] [chunks] [layers] [parts] [stoch]
  python tools/drift_w8a8.py run-base {bf16,w8a8} [steps] [chunks] [layers]
  python tools/drift_w8a8.py compare-base         [steps] [chunks] [layers]
  python tools/drift_w8a8.py run-t2to {bf16,w8a8} [steps] [chunks] [layers]
  python tools/drift_w8a8.py compare-t2to         [steps] [chunks] [layers]
  python tools/drift_w8a8.py run-feed {bf16,w8a8} [steps] [chunks] [t2to_layers] [to2v_layers]
  python tools/drift_w8a8.py compare-feed         [steps] [chunks] [t2to_layers] [to2v_layers]

`run-base`/`compare-base` probe the plain N-step base denoise (no FIFO) —
the VERDICT item's second workload, e.g. the reference's 52-step DPM run.

`parts`/`stoch` (FIFO arms): `parts=4 stoch=1` is the SHIPPED production
geometry — 2*4=8 lookahead ranks, stochastic DPM with injected noise that is
identical across arms (both derive every noise draw from PRNGKey(2) folded
by iteration/rank), mirroring `cogvideo_sampling_mp_fifo.py:223-334`.

`run-t2to` probes the SECOND quantized stage: the T2To token DiT
(patch_size=1, `pipeline_cogvideox_t2to.py:822-904`) generates the
condensed-token track bf16 vs w8a8 from the same master weights; compare-t2to
reports drift on the 16-dim token latents AND on the post-PCA 3072-dim token
frames that actually seed To2V. `run-feed` then renders each arm's token
track through one FIXED bf16 To2V FIFO (reduced depth) — compare-feed is the
decoded-video-delta answer: how much does T2To quantization error perturb the
final long video?
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


def start_rss_monitor(period_s: float = 30.0):
    """Print host RSS every `period_s` — the feed arms host-OOM'd at 129 GB
    with no observable phase, so every run narrates its memory now."""
    import threading

    t0 = time.time()

    def read_rss_gb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 / 1024
        return -1.0

    def loop():
        while True:
            print(f"[RSS] t={time.time()-t0:7.0f}s rss={read_rss_gb():6.1f} GB",
                  flush=True)
            time.sleep(period_s)

    threading.Thread(target=loop, daemon=True).start()


def tag(steps, chunks, layers, parts=1, stoch=False):
    t = f"s{steps}_c{chunks}_l{layers}"
    if parts != 1:
        t += f"_p{parts}"
    if stoch:
        t += "_st"
    return t


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR on [-1,1]-range videos (peak-to-peak 2.0)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(4.0 / mse)


def build(arm, steps, chunks, layers, ff_chunks, want_vae=True,
          parts=1, stoch=False):
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
        num_inference_steps=steps, num_partitions=parts, stochastic=stoch,
        fifo_emit_dtype="bfloat16",
        sequential_cfg=layers > 36,
    )
    vc = VIPConfig()
    rcfg = ResamplerConfig()
    vcfg = VAEConfig.cogvideox(dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(key, 3)

    t0 = time.time()
    vae_runner = None
    if want_vae:
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


def run_arm(arm, steps, chunks, layers, ff_chunks, parts=1, stoch=False):
    import jax

    os.makedirs(OUT_DIR, exist_ok=True)
    prefix = os.path.join(
        OUT_DIR, f"{arm}_{tag(steps, chunks, layers, parts, stoch)}")
    pipe, frames, text, neg, t0 = build(arm, steps, chunks, layers, ff_chunks,
                                        parts=parts, stoch=stoch)

    em_series = []

    def on_emit(i, em_np):
        em_series.append(em_np.astype(np.float32))
        # checkpoint the partial series every 10 iterations (and at the end,
        # below): rewriting the full stack EVERY iteration is O(n^2) disk
        # traffic (~50 GB cumulative at the 150+-iteration horizon arm)
        if i % 10 == 9:
            np.save(prefix + "_em_partial.npy", np.stack(em_series))
        if i % 5 == 0:
            print(f"[{time.time()-t0:7.1f}s] fifo iter {i} landed", flush=True)

    t1 = time.time()
    out = pipe.generate(text, neg, frames=frames, num_chunks=chunks,
                        rng=jax.random.PRNGKey(2), offload_vae=True,
                        host_loop=True, decode=False, emit_callback=on_emit)
    np.save(prefix + "_em_partial.npy", np.stack(em_series))
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


def load_arm(arm, steps, chunks, layers, parts=1, stoch=False):
    """Return (em_series [iters,B,C,H,W], orig_latents|None, complete)."""
    prefix = os.path.join(
        OUT_DIR, f"{arm}_{tag(steps, chunks, layers, parts, stoch)}")
    if os.path.exists(prefix + ".npz"):
        z = np.load(prefix + ".npz")
        em = np.load(prefix + "_em_partial.npy")
        return em, z["orig_latents"], True
    if os.path.exists(prefix + "_em_partial.npy"):
        return np.load(prefix + "_em_partial.npy"), None, False
    raise FileNotFoundError(f"no drift output for arm {arm} at {prefix}*")


def compare(steps, chunks, layers, decode=False, parts=1, stoch=False):
    eb, ob, cb = load_arm("bf16", steps, chunks, layers, parts, stoch)
    eq, oq, cq = load_arm("w8a8", steps, chunks, layers, parts, stoch)
    n = min(eb.shape[0], eq.shape[0])
    print(f"bf16 iters={eb.shape[0]} (complete={cb})  "
          f"w8a8 iters={eq.shape[0]} (complete={cq})  comparing first {n}")
    var = float(np.var(eb[:n]))
    rel_mse = [float(np.mean((eb[i] - eq[i]) ** 2)) / max(var, 1e-12)
               for i in range(n)]
    summary = {
        "steps": steps, "chunks": chunks, "layers": layers,
        "num_partitions": parts, "stochastic": stoch,
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
            # NOTE: do not shadow the `parts` (num_partitions) argument here —
            # it names the output JSON below (shadowing it with the decoded
            # pieces once produced a kilobyte-long filename and an OSError
            # after the summary print)
            pieces = [runner.decode(z[:, s:s + nf])
                      for s in range(0, t_use, nf)]
            vids[name] = np.asarray(jnp.concatenate(pieces, axis=1))
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
        print(f"  iter {i:3d}: rel MSE {rel_mse[i]:.3e}{extra}")
    print(f"  last   : rel MSE {rel_mse[-1]:.3e}")
    print("DRIFT_SUMMARY " + json.dumps(summary), flush=True)
    out_path = os.path.join(
        OUT_DIR, f"drift_w8a8_{tag(steps, chunks, layers, parts, stoch)}.json")
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "rel_mse": rel_mse,
                   "frame_psnr": frame_psnr}, f)
    print(f"wrote {out_path}", flush=True)


def build_t2to(arm, steps, chunks, layers):
    """T2To pipeline over a shared host master tree; w8a8 quantizes the same
    weights (mirrors `infer.py`'s T2To quant application)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.core import pca as pca_lib
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    from tokensgen_tpu.models.dit import (
        CogVideoXTransformer, DiTConfig, quantize_dit_params)
    from tokensgen_tpu.pipelines.t2to import T2ToConfig, T2ToPipeline
    from tokensgen_tpu.utils.params import init_params_bf16, param_count

    t0 = time.time()
    # production geometry: stochastic DPM, vip_1 schedule (pipeline default),
    # token latents [1, 4*chunks, 16, 8, 12] (`pipeline_cogvideox_t2to.py:
    # 768-782`)
    tcfg = T2ToConfig(num_inference_steps=steps, stochastic=True)
    dcfg0 = DiTConfig.t2to_5b(num_layers=layers)
    f = chunks * tcfg.num_frames_per_chunk
    rope = get_3d_rotary_pos_embed_v2(
        dcfg0.attention_head_dim, np.arange(f), np.arange(8), np.arange(12),
        dim_t=52, dim_h=6, dim_w=6)
    with jax.default_device(jax.devices("cpu")[0]):
        dit0 = CogVideoXTransformer(dcfg0)
        master = init_params_bf16(
            dit0.init, jax.random.PRNGKey(3),
            jnp.zeros((1, f, 16, 8, 12), jnp.bfloat16),
            jnp.zeros((1, dcfg0.max_text_seq_length, dcfg0.text_embed_dim),
                      jnp.bfloat16),
            jnp.zeros((1,), jnp.int32),
            image_rotary_emb=rope)
    print(f"[{time.time()-t0:7.1f}s] t2to master params: "
          f"{param_count(master)/1e9:.2f}B", flush=True)
    dcfg = dc.replace(dcfg0, quant=None if arm == "bf16" else "w8a8")
    with jax.default_device(jax.devices("cpu")[0]):
        params = (master if arm == "bf16"
                  else {"params": quantize_dit_params(master["params"], dcfg)})

    # deterministic synthetic PCA + stats (both arms share them): a seeded
    # orthonormal basis in the 3072-dim token space stands in for the
    # imported pca.pt (host QR — no device SVD needed)
    rng_src = np.random.default_rng(11)
    import jax.numpy as jnp2
    # full square basis: postprocess zero-pads 16 -> 3072 PCA coords and
    # lifts through all components (`pipeline_cogvideox_t2to.py:891-904`)
    q, _ = np.linalg.qr(rng_src.normal(size=(3072, 3072)))
    pca = pca_lib.PCAState(
        mean=jnp2.asarray(rng_src.normal(size=(1, 3072)) * 0.1, jnp2.float32),
        components=jnp2.asarray(q.T, jnp2.float32))
    mean = jnp2.asarray(rng_src.normal(size=(1, 3072)) * 0.1, jnp2.float32)
    std = jnp2.asarray(1.0 + 0.1 * rng_src.uniform(size=(1, 3072)), jnp2.float32)
    pipe = T2ToPipeline(tcfg, dcfg, params, pca=pca, token_mean=mean,
                        token_std=std)
    text = jnp2.asarray(rng_src.normal(size=(1, 226, 4096)) * 0.02, jnp2.bfloat16)
    neg = jnp2.zeros_like(text)
    return pipe, text, neg, t0


def run_t2to(arm, steps, chunks, layers):
    import jax

    os.makedirs(OUT_DIR, exist_ok=True)
    prefix = os.path.join(OUT_DIR, f"t2to_{arm}_{tag(steps, chunks, layers)}")
    pipe, text, neg, t0 = build_t2to(arm, steps, chunks, layers)
    t1 = time.time()
    lat = pipe.generate_tokens(text, neg, num_chunks=chunks,
                               rng=jax.random.PRNGKey(2))
    toks = pipe.postprocess(lat)
    np.savez(prefix + ".npz",
             latents=np.asarray(lat).astype(np.float32),
             token_frames=np.asarray(toks).astype(np.float32))
    print(f"[{time.time()-t0:7.1f}s] t2to {arm}: {time.time()-t1:.1f}s "
          f"-> {prefix}.npz", flush=True)


def compare_t2to(steps, chunks, layers):
    zb = np.load(os.path.join(OUT_DIR, f"t2to_bf16_{tag(steps, chunks, layers)}.npz"))
    zq = np.load(os.path.join(OUT_DIR, f"t2to_w8a8_{tag(steps, chunks, layers)}.npz"))

    def rel(a, b):
        return float(np.mean((a - b) ** 2)) / max(float(np.var(a)), 1e-12)

    summary = {
        "steps": steps, "chunks": chunks, "layers": layers,
        "t2to_latent_rel_mse": rel(zb["latents"], zq["latents"]),
        "t2to_token_frame_rel_mse": rel(zb["token_frames"], zq["token_frames"]),
    }
    print(f"t2to {steps}-step token drift (w8a8 vs bf16): "
          f"latent rel MSE {summary['t2to_latent_rel_mse']:.6f}, "
          f"post-PCA token-frame rel MSE "
          f"{summary['t2to_token_frame_rel_mse']:.6f}")
    print("DRIFT_T2TO_SUMMARY " + json.dumps(summary), flush=True)
    out_path = os.path.join(
        OUT_DIR, f"drift_t2to_w8a8_{tag(steps, chunks, layers)}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f)
    print(f"wrote {out_path}", flush=True)


def run_feed(arm, steps, chunks, t2to_layers, to2v_layers):
    """Render arm's T2To token track through ONE fixed bf16 To2V FIFO at
    production geometry — isolates the downstream effect of T2To quant."""
    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.pipelines.t2to import extend_generated_tokens

    z = np.load(os.path.join(
        OUT_DIR, f"t2to_{arm}_{tag(steps, chunks, t2to_layers)}.npz"))
    toks = jnp.asarray(z["token_frames"])
    toks = extend_generated_tokens(toks, chunks)
    emb = jnp.concatenate([toks, toks], axis=0)  # 2-way CFG batch

    prefix = os.path.join(
        OUT_DIR,
        f"feed_{arm}_{tag(steps, chunks, t2to_layers)}_v{to2v_layers}")
    # To2V arm is ALWAYS bf16 (the fixed renderer); production FIFO geometry
    pipe, _frames, text, neg, t0 = build(
        "bf16", steps, chunks, to2v_layers, ff_chunks=8, want_vae=False,
        parts=4, stoch=True)
    # the build() master lives on the HOST cpu device; land it on the chip
    # ONCE — otherwise every host-loop step re-uploads the full tree through
    # the tunnel and the client's serialized buffers OOM the host (observed:
    # 129 GB RSS ≈ 45 steps x 2.8 GB before the first run was oom-killed)
    pipe.dit_params = jax.device_put(pipe.dit_params, jax.devices()[0])
    t1 = time.time()
    print(f"[{time.time()-t0:7.1f}s] feed {arm}: generate begins", flush=True)

    def on_emit(i, _em):
        if i % 10 == 0:
            print(f"[{time.time()-t0:7.1f}s] feed fifo iter {i}", flush=True)

    out = pipe.generate(text, neg, image_embeddings=emb, num_chunks=chunks,
                        rng=jax.random.PRNGKey(2), host_loop=True,
                        decode=False, emit_callback=on_emit)
    np.savez(prefix + ".npz",
             latents=np.asarray(out["latents"]).astype(np.float32),
             orig_latents=np.asarray(out["orig_latents"]).astype(np.float32))
    print(f"[{time.time()-t0:7.1f}s] feed {arm}: {time.time()-t1:.1f}s "
          f"-> {prefix}.npz", flush=True)


def compare_feed(steps, chunks, t2to_layers, to2v_layers, decode=False):
    zb = np.load(os.path.join(
        OUT_DIR, f"feed_bf16_{tag(steps, chunks, t2to_layers)}_v{to2v_layers}.npz"))
    zq = np.load(os.path.join(
        OUT_DIR, f"feed_w8a8_{tag(steps, chunks, t2to_layers)}_v{to2v_layers}.npz"))

    def rel(a, b):
        return float(np.mean((a - b) ** 2)) / max(float(np.var(a)), 1e-12)

    summary = {
        "steps": steps, "chunks": chunks, "t2to_layers": t2to_layers,
        "to2v_layers": to2v_layers,
        "feed_fifo_rel_mse": rel(zb["latents"], zq["latents"]),
        "feed_base_rel_mse": rel(zb["orig_latents"], zq["orig_latents"]),
    }
    if decode:
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
        vids = {}
        for name, zz in (("bf16", zb), ("w8a8", zq)):
            lat = zz["latents"]
            t_use = (lat.shape[1] // nf) * nf
            z = jnp.asarray(lat[:, :t_use]) / vcfg.scaling_factor
            z = z.transpose(0, 1, 3, 4, 2)
            parts = [runner.decode(z[:, s:s + nf]) for s in range(0, t_use, nf)]
            vids[name] = np.asarray(jnp.concatenate(parts, axis=1))
        vb, vq = vids["bf16"][0], vids["w8a8"][0]
        fp = [psnr(vb[i], vq[i]) for i in range(vb.shape[0])]
        summary["feed_frame_psnr_min"] = min(fp)
        summary["feed_frame_psnr_mean"] = float(np.mean(fp))
    print("DRIFT_FEED_SUMMARY " + json.dumps(summary), flush=True)
    out_path = os.path.join(
        OUT_DIR,
        f"drift_feed_w8a8_{tag(steps, chunks, t2to_layers)}_v{to2v_layers}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f)
    print(f"wrote {out_path}", flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if mode.startswith("run"):
        start_rss_monitor()
    if mode == "run":
        arm = sys.argv[2]
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 13
        chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 2
        layers = int(sys.argv[5]) if len(sys.argv) > 5 else 42
        ff_chunks = int(sys.argv[6]) if len(sys.argv) > 6 else 8
        parts = int(sys.argv[7]) if len(sys.argv) > 7 else 1
        stoch = bool(int(sys.argv[8])) if len(sys.argv) > 8 else False
        run_arm(arm, steps, chunks, layers, ff_chunks, parts, stoch)
    elif mode == "run-t2to":
        arm = sys.argv[2]
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 52
        chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 2
        layers = int(sys.argv[5]) if len(sys.argv) > 5 else 42
        run_t2to(arm, steps, chunks, layers)
    elif mode == "compare-t2to":
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 52
        chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        layers = int(sys.argv[4]) if len(sys.argv) > 4 else 42
        compare_t2to(steps, chunks, layers)
    elif mode == "run-feed":
        arm = sys.argv[2]
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 52
        chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 2
        t2to_layers = int(sys.argv[5]) if len(sys.argv) > 5 else 42
        to2v_layers = int(sys.argv[6]) if len(sys.argv) > 6 else 8
        run_feed(arm, steps, chunks, t2to_layers, to2v_layers)
    elif mode == "compare-feed":
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 52
        chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        t2to_layers = int(sys.argv[4]) if len(sys.argv) > 4 else 42
        to2v_layers = int(sys.argv[5]) if len(sys.argv) > 5 else 8
        compare_feed(steps, chunks, t2to_layers, to2v_layers,
                     decode="--decode" in sys.argv)
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
        argv = [a for a in sys.argv if not a.startswith("--")]
        steps = int(argv[2]) if len(argv) > 2 else 13
        chunks = int(argv[3]) if len(argv) > 3 else 2
        layers = int(argv[4]) if len(argv) > 4 else 42
        parts = int(argv[5]) if len(argv) > 5 else 1
        stoch = bool(int(argv[6])) if len(argv) > 6 else False
        compare(steps, chunks, layers, decode="--decode" in sys.argv,
                parts=parts, stoch=stoch)
    else:
        raise SystemExit(__doc__)


if __name__ == "__main__":
    main()

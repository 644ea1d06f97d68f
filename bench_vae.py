"""Secondary benchmark: 3D causal VAE encode/decode throughput (BASELINE.md
north-star "VAE enc/dec fps"). Not driver-run (bench.py is the single headline);
prints one JSON line per direction to stderr-documented stdout."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner
    from tokensgen_tpu.utils.params import init_params_bf16

    cfg = VAEConfig.cogvideox(dtype=jnp.bfloat16)
    model = AutoencoderKLCogVideoX(cfg)
    h, w, f_px = 480, 720, 49

    x0 = jnp.zeros((1, 9, h, w, 3), jnp.bfloat16)
    log("init VAE params (bf16)...")
    params = init_params_bf16(model.init, jax.random.PRNGKey(0), x0)
    runner = VAERunner(cfg, params)

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.uniform(-1, 1, size=(1, f_px, h, w, 3)), jnp.bfloat16)

    t0 = time.time()
    lat = runner.encode(video)
    # scalar readback, not block_until_ready: through the remote tunnel the
    # latter can return early, bleeding compile time into the timed window
    float(jnp.mean(lat.astype(jnp.float32)))
    log(f"encode compile+run: {time.time()-t0:.1f}s -> {lat.shape}")
    videos = [video * (1.0 + 0.01 * i) for i in range(3)]
    t0 = time.time()
    outs = [runner.encode(v) for v in videos]
    # host-side value fetch: block_until_ready through the remote tunnel can
    # return before compute finishes (observed implausible timings); a scalar
    # readback cannot.
    sink = sum(float(jnp.mean(o.astype(jnp.float32))) for o in outs)
    log(f"sink {sink:.4f}")
    enc_s = (time.time() - t0) / len(videos)
    print(json.dumps({"metric": "vae_encode_fps_720x480", "value": round(f_px / enc_s, 2),
                      "unit": "px frames/s (1 chip v5e)", "vs_baseline": 1.0}))

    from tokensgen_tpu.models.vae3d import sample_latent

    z = sample_latent(lat, None)
    t0 = time.time()
    dec = runner.decode(z)
    float(jnp.mean(dec.astype(jnp.float32)))
    log(f"decode compile+run: {time.time()-t0:.1f}s -> {dec.shape}")
    zs = [z * (1.0 + 0.01 * i) for i in range(3)]
    t0 = time.time()
    outs = [runner.decode(zz) for zz in zs]
    sink = sum(float(jnp.mean(o.astype(jnp.float32))) for o in outs)
    log(f"sink {sink:.4f}")
    dec_s = (time.time() - t0) / len(zs)
    print(json.dumps({"metric": "vae_decode_fps_720x480", "value": round(f_px / dec_s, 2),
                      "unit": "px frames/s (1 chip v5e)", "vs_baseline": 1.0}))


if __name__ == "__main__":
    main()

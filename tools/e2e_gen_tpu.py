"""Production-size GENERATION workload end-to-end on one TPU chip.

The second BASELINE workload (`config/infer/gen.yaml` semantics,
`infer_cogvideo_mp_fifo.py:219-234,266-279`): T2To generates the condensed
tokens for the whole long video from text, To2V renders them with FIFO —
no source video. Random weights (no checkpoint exists in this environment);
every jitted program is the production program.

Two-stage single-chip orchestration: the full 5.57B T2To transformer runs
first (11.1 GB bf16 — fits alone), its params are dropped, then the To2V
stack runs with the same phase-offload orchestration as the edit e2e
(`tools/e2e_to2v_tpu.py`).

Usage: python tools/e2e_gen_tpu.py [steps] [chunks] [layers] [steps2nd]
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

from tokensgen_tpu.core import pca as pca_lib
from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.models.dit import (
    CogVideoXTransformer, DiTConfig, VIPConfig, graft_vip_params,
)
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner
from tokensgen_tpu.pipelines.t2to import (
    T2ToConfig, T2ToPipeline, extend_generated_tokens,
)
from tokensgen_tpu.pipelines.to2v import To2VConfig, To2VPipeline
from tokensgen_tpu.utils.params import init_params_bf16, param_count


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    layers = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    steps2 = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    rng_np = np.random.default_rng(0)
    t0 = time.time()

    # ---------------- stage 1: T2To condensed-token generation (HOT LOOP #1)
    t2cfg = T2ToConfig(num_inference_steps=steps2, stochastic=False)
    t2dcfg = DiTConfig.t2to_5b(num_layers=layers)
    t2model = CogVideoXTransformer(t2dcfg)
    t2pipe_tmp = T2ToPipeline(t2cfg, t2dcfg, None)
    f0 = t2cfg.num_frames_per_chunk * chunks
    t2params = init_params_bf16(
        t2model.init, jax.random.PRNGKey(1),
        jnp.zeros((1, f0, t2cfg.latent_channels, t2cfg.height, t2cfg.width),
                  jnp.bfloat16),
        jnp.zeros((1, t2dcfg.max_text_seq_length, t2dcfg.text_embed_dim),
                  jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
        image_rotary_emb=t2pipe_tmp.rope(f0),
    )
    print(f"[{time.time()-t0:7.1f}s] T2To params: "
          f"{param_count(t2params)/1e9:.2f}B", flush=True)

    # random-fit PCA stand-in for the mean/std/pca artifacts (none exist
    # here). Sample count must be >= token_dim: inverse_transform needs the
    # full square [3072, 3072] component matrix (the reference's pca.pt is a
    # full PCA), and SVD only yields min(n_samples, dim) components.
    pca_state = pca_lib.fit(
        jnp.asarray(rng_np.normal(size=(t2cfg.token_dim + 64,
                                        t2cfg.token_dim)), jnp.float32),
        None)
    mean = jnp.zeros((1, t2cfg.token_dim))
    std = jnp.ones((1, t2cfg.token_dim))
    t2pipe = T2ToPipeline(t2cfg, t2dcfg, t2params, pca=pca_state,
                          token_mean=mean, token_std=std)

    text = jnp.asarray(rng_np.normal(size=(1, 226, 4096)) * 0.02, jnp.bfloat16)
    neg = jnp.zeros_like(text)
    t1 = time.time()
    toks = t2pipe(text, neg, num_chunks=chunks, rng=jax.random.PRNGKey(2))
    toks = np.asarray(toks)
    print(f"[{time.time()-t0:7.1f}s] T2To tokens {toks.shape} in "
          f"{time.time()-t1:.1f}s (incl. compile), "
          f"finite={np.isfinite(toks).all()}", flush=True)
    # free the 11 GB T2To stack before the To2V stage
    del t2pipe, t2params

    toks = extend_generated_tokens(jnp.asarray(toks), chunks)
    image_embeddings = jnp.concatenate([toks, toks], axis=0)  # CFG pair

    # ---------------- stage 2: To2V FIFO render conditioned on the tokens
    cfg = To2VConfig(
        height=480, width=720, num_frames_per_chunk=49,
        num_inference_steps=steps, num_partitions=1, stochastic=False,
        fifo_emit_dtype="bfloat16", sequential_cfg=layers > 36,
    )
    vc = VIPConfig()
    dcfg = DiTConfig.cogvideox_5b(vip=vc, ff_chunks=8, num_layers=layers)
    rcfg = ResamplerConfig()
    vcfg = VAEConfig.cogvideox(dtype=jnp.bfloat16)
    r1, r2, r3 = jax.random.split(jax.random.PRNGKey(0), 3)

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
    rope = get_3d_rotary_pos_embed_v2(
        d, np.arange(13), np.arange(30), np.arange(45))
    import contextlib
    offload = layers > 24
    init_dev = (jax.default_device(jax.devices("cpu")[0]) if offload
                else contextlib.nullcontext())
    with init_dev:
        dit_params = init_params_bf16(
            dit.init, r3,
            jnp.zeros((1, 13, 16, 60, 90), jnp.bfloat16),
            jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim),
                      jnp.bfloat16),
            jnp.zeros((1,), jnp.int32),
            vip_hidden_states=jnp.zeros((1, 5, 3072, 8, 12), jnp.bfloat16),
            image_rotary_emb=rope,
            vip_image_rotary_emb=rope,
            vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(
                d, np.arange(5), np.arange(8), np.arange(12)),
        )
        dit_params = {"params": graft_vip_params(dit_params["params"], dcfg)}
    print(f"[{time.time()-t0:7.1f}s] To2V params ready", flush=True)

    sched = S.make_schedule(S.ScheduleConfig())
    pipe = To2VPipeline(cfg, dcfg, dit_params, rcfg, rs_params, vae_runner,
                        sched)
    del dit_params, rs_params, vae_params

    t2 = time.time()
    out = pipe.generate(
        text, neg, image_embeddings=image_embeddings, num_chunks=chunks,
        rng=jax.random.PRNGKey(3), offload_vae=offload,
        host_loop=layers > 36)
    video = np.asarray(out["video"].astype(jnp.float32))
    print(f"[{time.time()-t0:7.1f}s] GEN E2E OK (incl. compile): "
          f"{time.time()-t2:.1f}s -> video {video.shape}, "
          f"finite={np.isfinite(video).all()}, std={video.std():.3f}",
          flush=True)
    assert np.isfinite(video).all()


if __name__ == "__main__":
    main()

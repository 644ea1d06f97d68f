"""One REAL To2V adapter train step on TPU hardware (VERDICT r2 item 4).

Runs the full training path end-to-end on the chip at the production token
shape (13 latent frames 720x480 + 226 text + 480 VIP tokens): forward with
per-block remat, packed Pallas attention backward, resampler-in-the-loss,
grad clip, masked optax update with blockwise-int8 Adam state — the exact
`train/to2v.py` train step the multi-chip trainer pjits, at reduced depth so
params + optimizer state + activations fit one 16 GB v5e. Reference anchor:
`train_cogvideo_to2v.py:1721-2029`.

Usage: python tools/bench_train.py [layers=8] [iters=3]
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
from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import DiTConfig, VIPConfig
from tokensgen_tpu.models.resampler import ResamplerConfig
from tokensgen_tpu.train import to2v
from tokensgen_tpu.utils.params import param_count


def main():
    # 8 layers misses the compile-time HBM check by 410 MB (16.15G vs
    # 15.75G usable: f32 params 7.0G + int8 Adam 1.4G + remat/backward
    # workspace); 6 layers fits
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    b, f = 1, 13
    hp, wp = 30, 45
    vc = VIPConfig()  # 480 vip tokens, 5b dims
    # ff_chunks=1: under per-block remat the chunk scan STACKS the gelu
    # intermediates for the backward (3x ~420 MB buffers in the OOM dump);
    # the plain FF's single temp is cheaper in training
    dcfg = DiTConfig.cogvideox_5b(num_layers=layers, vip=vc, remat=True,
                                  ff_chunks=1)
    rcfg = ResamplerConfig()
    d = dcfg.attention_head_dim
    rng = np.random.default_rng(0)

    n_vip = rcfg.num_temporal_queries + 1  # 5 query frames (4 + next chunk's 1st)
    batch = {
        "latents": jnp.asarray(rng.normal(size=(b, f, 16, 60, 90)), jnp.float32),
        # production vip staging: 2-chunk clip resampled per chunk, 5-query
        # window selected by index (`train_cogvideo_to2v.py:1928-1976`)
        "vip_input_chunks": jnp.asarray(
            rng.normal(size=(b, 2, f, hp * wp, rcfg.embedding_dim)) * 0.02,
            jnp.bfloat16),
        "vip_emb_sel": jnp.asarray(
            np.broadcast_to(np.arange(2, 2 + n_vip), (b, n_vip)).copy()),
        "text_embeds": jnp.asarray(
            rng.normal(size=(b, dcfg.max_text_seq_length, dcfg.text_embed_dim))
            * 0.02, jnp.bfloat16),
        "image_rotary_emb": get_3d_rotary_pos_embed_v2(
            d, np.arange(f), np.arange(hp), np.arange(wp)),
        "vip_image_rotary_emb": get_3d_rotary_pos_embed_v2(
            d, np.arange(f) + 1000, np.arange(hp), np.arange(wp)),
        "vip_condition_rotary_emb": get_3d_rotary_pos_embed_v2(
            d, np.arange(n_vip) + 1000, np.arange(8), np.arange(12)),
        "resampler_image_rotary_emb": get_3d_rotary_pos_embed_v2(
            d, np.arange(f), np.arange(hp), np.arange(wp)),
        "resampler_sampling_rotary_emb": get_3d_rotary_pos_embed_v2(
            d, np.linspace(1000, 1000 + f, rcfg.num_temporal_queries,
                           endpoint=False),
            np.arange(8), np.arange(12)),
    }

    sched = S.make_schedule(S.ScheduleConfig())
    tcfg = to2v.To2VTrainConfig(use_8bit_adam=True)

    t0 = time.time()
    # init uses a single-chunk view (4 query frames) — the DiT/resampler
    # params are vip-length-independent, only the example ropes must match
    init_batch = dict(batch)
    init_batch["vip_input"] = batch["vip_input_chunks"][:, 0]
    init_batch["vip_condition_rotary_emb"] = get_3d_rotary_pos_embed_v2(
        d, np.arange(rcfg.num_temporal_queries) + 1000, np.arange(8),
        np.arange(12))
    params = to2v.init_params(dcfg, rcfg, jax.random.PRNGKey(0), init_batch)
    params = to2v.cast_frozen_bf16(params)
    n_dit = param_count(params["dit"])
    n_rs = param_count(params["resampler"])
    labels = to2v.trainable_labels(params)
    import flax

    n_train = sum(
        int(np.prod(v.shape))
        for k, v in flax.traverse_util.flatten_dict(params).items()
        if flax.traverse_util.flatten_dict(labels)[k] == "train")
    print(f"[{time.time()-t0:6.1f}s] params: dit {n_dit/1e9:.2f}B "
          f"({layers} layers) + resampler {n_rs/1e9:.2f}B; trainable "
          f"{n_train/1e6:.1f}M (vip_* + resampler)", flush=True)

    optimizer = to2v.make_optimizer(params, tcfg)
    opt_state = optimizer.init(params)
    opt_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(opt_state)
        if hasattr(x, "dtype"))
    print(f"[{time.time()-t0:6.1f}s] optimizer state: {opt_bytes/1e6:.1f} MB "
          f"(blockwise-int8 Adam over trainable leaves)", flush=True)

    step = jax.jit(to2v.make_train_step(dcfg, rcfg, sched, tcfg, optimizer),
                   donate_argnums=(0, 1))

    if os.environ.get("BENCH_TRAIN_TRACE_ONLY") == "1":
        # shape/type validation without compiling (CPU smoke)
        step.lower(params, opt_state, batch, jax.random.PRNGKey(1))
        print("TRACE OK", flush=True)
        return

    t1 = time.time()
    params, opt_state, metrics = step(params, opt_state, batch,
                                      jax.random.PRNGKey(1))
    loss0 = float(metrics["loss"])
    print(f"[{time.time()-t0:6.1f}s] compile+step 1: {time.time()-t1:.1f}s, "
          f"loss={loss0:.4f} grad_norm={float(metrics['grad_norm']):.4f}",
          flush=True)
    assert np.isfinite(loss0)

    times = []
    for it in range(iters):
        t2 = time.time()
        params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.fold_in(jax.random.PRNGKey(1), it))
        loss = float(metrics["loss"])  # blocks on the full step
        times.append(time.time() - t2)
        print(f"  warm step {it}: {times[-1]*1e3:.0f} ms, loss={loss:.4f}",
              flush=True)
        assert np.isfinite(loss)
    t_step = min(times)
    per_layer = t_step / layers
    print(f"RESULT: {layers}-layer B=1 To2V adapter train step {t_step*1e3:.0f} ms "
          f"({per_layer*1e3:.1f} ms/layer); extrapolated 42-layer B=1 "
          f"{per_layer*42:.1f} s/step per chip (multi-chip by construction: "
          f"full-size params+opt exceed one 16 GB chip)", flush=True)


if __name__ == "__main__":
    main()

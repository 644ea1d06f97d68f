"""One REAL T2To train step on TPU hardware (full-finetune path).

The T2To trainer updates ALL transformer params (f32 masters + plain AdamW,
`train_cogvideo_t2to.py:1269-1284`), so a reduced depth must fit
params + m + v + grads (4x f32) on the 16 GB part. Runs the exact
`train/t2to.py` step at the production token shape: bs 3 (reference
per-GPU batch), 24 chunks -> [3, 96, 16, 8, 12] latents, rope (52,6,6),
padded-chunk key-bias + loss masks, per-block remat, packed Pallas
attention backward with in-kernel key-bias grads.

Usage: python tools/bench_train_t2to.py [layers=6] [iters=3]
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
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
from tokensgen_tpu.train import t2to
from tokensgen_tpu.utils.params import param_count


def main():
    layers = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    b, chunks = 3, 24
    f = 4 * chunks  # 96 token frames
    dcfg = DiTConfig.t2to_5b(num_layers=layers, remat=True)
    tcfg = t2to.T2ToTrainConfig()
    sched = S.make_schedule(S.ScheduleConfig(beta_schedule="vip_1"))
    rng = np.random.default_rng(0)

    t0 = time.time()
    dit = CogVideoXTransformer(dcfg)
    rope = get_3d_rotary_pos_embed_v2(
        dcfg.attention_head_dim, np.arange(f), np.arange(tcfg.height),
        np.arange(tcfg.width), dim_t=52, dim_h=6, dim_w=6)
    params = dit.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, f, 16, tcfg.height, tcfg.width)),
        jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32), image_rotary_emb=rope,
    )["params"]
    n = param_count(params)
    print(f"[{time.time()-t0:6.1f}s] params: {n/1e9:.2f}B f32 masters "
          f"({layers} layers), ALL trainable", flush=True)

    optimizer = t2to.make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = jax.jit(t2to.make_train_step(dcfg, sched, tcfg, optimizer),
                   donate_argnums=(0, 1))

    batch = {
        "latents": jnp.asarray(rng.normal(size=(b, f, 16, tcfg.height,
                                                tcfg.width)), jnp.float32),
        "text_embeds": jnp.asarray(
            rng.normal(size=(b, dcfg.max_text_seq_length,
                             dcfg.text_embed_dim)) * 0.02, jnp.bfloat16),
        "valid_frames": jnp.asarray([96, 80, 64], jnp.int32),
    }

    if os.environ.get("BENCH_TRAIN_TRACE_ONLY") == "1":
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
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.fold_in(jax.random.PRNGKey(1), it))
        loss = float(metrics["loss"])
        times.append(time.time() - t2)
        print(f"  warm step {it}: {times[-1]*1e3:.0f} ms, loss={loss:.4f}",
              flush=True)
        assert np.isfinite(loss)
    t_step = min(times)
    print(f"RESULT: {layers}-layer bs=3 T2To full-finetune train step "
          f"{t_step*1e3:.0f} ms ({t_step/layers*1e3:.1f} ms/layer); "
          f"extrapolated 42-layer bs=3 {t_step/layers*42:.1f} s/step per chip "
          f"(full-size f32 masters + AdamW need ~67 GB -> multi-chip "
          f"dp/ZeRO-1 by construction)", flush=True)


if __name__ == "__main__":
    main()

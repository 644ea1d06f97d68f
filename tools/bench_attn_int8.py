"""int8-score packed kernel vs shipped bf16 at the 18k production shape.

Measures `_flash_fused_packed_tpu(int8_scores=True)` — int8 score matmul with
per-row q / per-column k dynamic scales, quantization amortized in the
_init/_prep_kv scratch builds — against the shipped bf16 kernel, plus the
output delta between the two (the accuracy budget for the `quant_attn` turbo).

Usage: python tools/bench_attn_int8.py [batch=2] [iters=10]
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

from tokensgen_tpu.kernels import attention as A


def timed(name, fn, *args, iters=10, flops=None):
    float(jnp.sum(fn(*args).astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:46s} {dt * 1e3:9.2f} ms{tf}", flush=True)
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    f, hp_, wp_ = 13, 30, 45
    s_text = 226
    sq = s_text + f * hp_ * wp_  # 17,776
    heads, d = 48, 64
    hd = heads * d
    q = jax.random.normal(jax.random.PRNGKey(0), (b, sq, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, sq, hd), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, sq, hd), jnp.bfloat16)
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (d,))) + 0.5
    bs_ = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (d,))

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp_),
                                      np.arange(wp_))
    segs = [(None, s_text), (rope, sq - s_text)]
    tq = A.make_prologue(d, segs, g, bs_, fold=d**-0.5)
    tk = A.make_prologue(d, segs, g, bs_)
    zb = jnp.zeros((b, sq), jnp.float32)
    fl = 4 * b * sq * sq * hd

    bf16 = jax.jit(lambda q_, k_, v_, tq_, tk_: A._flash_fused_packed_tpu(
        q_, k_, v_, zb, tq_, tk_, heads, 2048, 1024, False, 1e-6, True, True))
    i8 = jax.jit(lambda q_, k_, v_, tq_, tk_: A._flash_fused_packed_tpu(
        q_, k_, v_, zb, tq_, tk_, heads, 2048, 1024, False, 1e-6, True, True,
        int8_scores=True))
    t_bf = timed(f"bf16 packed (B={b}, q2048/kv1024)", bf16, q, k, v, tq, tk,
                 iters=iters, flops=fl)
    t_i8 = timed(f"int8-scores (B={b}, q2048/kv1024)", i8, q, k, v, tq, tk,
                 iters=iters, flops=fl)
    print(f"speedup: {t_bf / t_i8:.3f}x", flush=True)

    o1 = bf16(q, k, v, tq, tk).astype(jnp.float32)
    o2 = i8(q, k, v, tq, tk).astype(jnp.float32)
    err = jnp.abs(o1 - o2)
    print(f"int8 vs bf16: max |d| {float(jnp.max(err)):.4f}  "
          f"mean |d| {float(jnp.mean(err)):.5f}  "
          f"out std {float(jnp.std(o1)):.4f}", flush=True)

    # block sweep on the int8 path
    for bq_, bkv_ in ((2048, 2048), (4096, 1024), (2048, 512)):
        try:
            fn = jax.jit(lambda q_, k_, v_, tq_, tk_, b1=bq_, b2=bkv_:
                         A._flash_fused_packed_tpu(
                             q_, k_, v_, zb, tq_, tk_, heads, b1, b2, False,
                             1e-6, True, True, int8_scores=True))
            timed(f"int8-scores q{bq_}/kv{bkv_}", fn, q, k, v, tq, tk,
                  iters=iters, flops=fl)
        except Exception as e:  # noqa: BLE001
            print(f"q{bq_}/kv{bkv_}: {type(e).__name__} {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()

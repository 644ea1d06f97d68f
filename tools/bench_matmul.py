"""Pure-matmul throughput at the DiT layer shapes (in-device loop).

Establishes the practical matmul ceiling of the chip for the per-layer glue
(qkv/out/FF projections): if XLA's large matmuls already run at the ceiling,
the glue budget in PERF.md is a floor; if not, a Pallas matmul is a lever.

Usage: python tools/bench_matmul.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

ITERS = 20


def loop_timed(name, step, x0, args, flops):
    jitted = jax.jit(lambda x, a: jax.lax.fori_loop(
        0, ITERS, lambda i, acc: step(acc, a), x))
    float(jnp.sum(jitted(x0, args).astype(jnp.float32)))
    t0 = time.time()
    out = jitted(x0, args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    print(f"{name:52s} {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)
    return dt


def main():
    s = 18432  # padded joint seq
    inner = 3072
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (s, inner), jnp.bfloat16)

    shapes = [
        ("qkv  [S,3072]@[3072,9216]", 3 * inner),
        ("out  [S,3072]@[3072,3072]", inner),
        ("ff1  [S,3072]@[3072,12288]", 4 * inner),
    ]
    for name, n_out in shapes:
        w = jax.random.normal(jax.random.PRNGKey(1), (inner, n_out), jnp.bfloat16) * 0.02
        wb = jax.random.normal(jax.random.PRNGKey(2), (n_out, inner), jnp.bfloat16) * 0.02

        def step(acc, a, w_=w, wb_=wb):
            return ((acc @ w_) @ wb_).astype(jnp.bfloat16)

        fl = 2 * s * inner * n_out * 2  # fwd + project-back
        loop_timed(name + " (+back)", step, x, (), fl)

    # ff1+gelu+ff2 chain exactly as the block runs it
    w1 = jax.random.normal(jax.random.PRNGKey(3), (inner, 4 * inner), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(4), (4 * inner, inner), jnp.bfloat16) * 0.02

    def ff_step(acc, a):
        return (jax.nn.gelu(acc @ w1, approximate=True) @ w2).astype(jnp.bfloat16)

    loop_timed("ff1+gelu+ff2 chain", ff_step, x, (),
               2 * s * inner * 4 * inner * 2)

    # f32 accumulation explicitly
    def ff_step32(acc, a):
        h = jax.lax.dot_general(acc, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h, approximate=True).astype(jnp.bfloat16)
        return jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)

    loop_timed("ff chain, f32 accum", ff_step32, x, (),
               2 * s * inner * 4 * inner * 2)

    # int8 x int8 -> int32 MXU rate at the ff1 shape (v5e lists 394 int8 TOPS
    # = 2x bf16 peak; if XLA reaches it, a W8A8 dense path is a real lever)
    xi = jnp.clip(jnp.round(x * 50), -127, 127).astype(jnp.int8)
    w1i = jnp.clip(jnp.round(w1 * 2000), -127, 127).astype(jnp.int8)

    def int8_step(acc, a):
        h = jax.lax.dot_general(acc, w1i, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # fold back to int8 with a shift so the loop stays int8-in
        return (h >> 12).astype(jnp.int8)[:, :inner]

    loop_timed("ff1 int8xint8->int32", int8_step, xi, (),
               2 * s * inner * 4 * inner)

    # W8A16: bf16 activations x int8 weights (dequant inline) — the
    # numerics-safe variant (weights HBM halves; MXU still runs bf16)
    def w8a16_step(acc, a):
        h = acc @ w1i.astype(jnp.bfloat16)
        return h[:, :inner].astype(jnp.bfloat16)

    loop_timed("ff1 bf16 x dequant-int8 (W8A16)", w8a16_step, x, (),
               2 * s * inner * 4 * inner)


if __name__ == "__main__":
    main()

"""int8 vs bf16 conv at VAE-decoder shapes, in-device fori_loop methodology
(the only timing this environment reports faithfully — see bench_vae_norm).

The int8 loop models what a quantized decoder would actually run per conv:
int8 activation x int8 weight -> int32 -> dequant (bf16) -> dynamic
per-tensor requant back to int8 for the next conv. bf16 loop: plain conv.

Usage: python tools/bench_conv_int8_loop.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

ITERS = 50


def loop_timed(name, fn, x, flops=None):
    jitted = jax.jit(
        lambda x0: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x0))
    float(jnp.sum(jitted(x)[0].astype(jnp.float32))
          if isinstance(jitted(x), tuple) else
          jnp.sum(jitted(x).astype(jnp.float32)))
    t0 = time.time()
    out = jitted(x)
    leaf = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    tf = f"  {flops / dt / 1e12:5.1f} TF/s" if flops else ""
    print(f"{name:48s} {dt * 1e3:8.3f} ms/iter{tf}", flush=True)
    return dt


def conv(a, w, out_t):
    return jax.lax.conv_general_dilated(
        a, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_t)


def main():
    key = jax.random.PRNGKey(0)
    for (t, h, w_, c) in [(8, 240, 360, 128), (8, 120, 180, 256),
                          (4, 60, 90, 512)]:
        fl = 2 * t * h * w_ * 9 * c * c
        xb = jax.random.normal(key, (t, h, w_, c), jnp.bfloat16)
        wb = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c),
                               jnp.bfloat16) * 0.02
        wq = jnp.clip(jnp.round(wb.astype(jnp.float32) / 2e-4), -127,
                      127).astype(jnp.int8)

        def bf16_loop(a, wb=wb):
            return conv(a, wb, jnp.bfloat16)

        def int8_loop(a, wq=wq):
            y = conv(a, wq, jnp.int32).astype(jnp.float32) * 2e-4
            s = jnp.maximum(jnp.max(jnp.abs(y)), 1e-6) / 127.0
            return jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

        def int8_noreq_loop(ab, wq=wq):
            # weight-only-int8-storage upper bound: activation arrives int8,
            # conv, dequant to bf16 only (no requant; shape trick: cast back)
            y = conv(ab, wq, jnp.int32).astype(jnp.bfloat16) * 2e-4
            return jnp.clip(y, -127, 127).astype(jnp.int8)

        xq = jnp.clip(jnp.round(xb.astype(jnp.float32)), -127,
                      127).astype(jnp.int8)
        loop_timed(f"bf16 conv {(t,h,w_,c)}", bf16_loop, xb, flops=fl)
        loop_timed(f"int8 conv + dequant + requant {(t,h,w_,c)}", int8_loop,
                   xq, flops=fl)
        loop_timed(f"int8 conv + cheap epilogue {(t,h,w_,c)}",
                   int8_noreq_loop, xq, flops=fl)


if __name__ == "__main__":
    main()

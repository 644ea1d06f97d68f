"""Probe: does XLA:TPU run s8xs8->s32 2-D convolutions at ~2x the bf16 MXU
rate at the VAE decoder's hot shapes?

The decoder is conv-throughput-bound (PERF.md round-3: ~91 TF/s on 128-ch
3x3 at the top level, normalization chains hide under the conv MXU time),
so int8 convs are the one remaining decode lever. This measures the raw op
before building a QuantConv path.

Usage: python tools/bench_conv_int8.py
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


def _fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed(name, fn, *args, iters=5, flops=None):
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / iters
    tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:48s} {dt * 1e3:9.2f} ms{tf}", flush=True)
    return dt


def conv(x, w, out_t):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_t)


def main():
    rng = np.random.default_rng(0)
    # decoder hot shapes (time folded into batch): top level [8,240,360,128]
    # pre-tiling -> measured per ~60x48-latent tile [8,240,360,C]; mid level
    # [8,120,180,256]; bottom [2,60,90,512]
    shapes = [
        ((8, 240, 360, 128), (3, 3, 128, 128)),
        ((8, 120, 180, 256), (3, 3, 256, 256)),
        ((4, 60, 90, 512), (3, 3, 512, 512)),
    ]
    for xs, ws in shapes:
        n, h, w_, ci = xs
        co = ws[-1]
        fl = 2 * n * h * w_ * 9 * ci * co
        xb = jnp.asarray(rng.normal(size=xs), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=ws) * 0.05, jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 128, size=xs), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 128, size=ws), jnp.int8)
        f_b = jax.jit(lambda a, b: conv(a, b, jnp.float32))
        f_i = jax.jit(lambda a, b: conv(a, b, jnp.int32))
        timed(f"bf16 conv {xs}x{ws[-1]}", f_b, xb, wb, flops=fl)
        try:
            timed(f"int8 conv {xs}x{ws[-1]}", f_i, xi, wi, flops=fl)
        except Exception as e:  # noqa: BLE001 - probe tool, report and move on
            print(f"int8 conv {xs}: FAILED {type(e).__name__}: {e}",
                  flush=True)
        # int8 with the dequant epilogue fused (what a QuantConv would run)
        sc = jnp.asarray(rng.normal(size=(co,)) * 0.01, jnp.float32)

        def qconv(a, b, s):
            y = conv(a, b, jnp.int32)
            return (y.astype(jnp.float32) * s).astype(jnp.bfloat16)

        try:
            timed(f"int8+dequant {xs}x{ws[-1]}", jax.jit(qconv), xi, wi, sc,
                  flops=fl)
        except Exception as e:  # noqa: BLE001
            print(f"int8+dequant {xs}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()

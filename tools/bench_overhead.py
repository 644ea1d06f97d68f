"""Calibrate per-dispatch overhead vs true MXU rates: run each op N times
inside one jit (lax.scan / fori_loop) so device time dominates."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp


def scalar_sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timed_loop(name, body, x0, n=20, flops=None):
    @jax.jit
    def run(x):
        def step(c, _):
            return body(c), None
        y, _ = jax.lax.scan(step, x, None, length=n)
        return y

    scalar_sync(run(x0))
    t0 = time.time()
    scalar_sync(run(x0))
    dt = (time.time() - t0) / n
    tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:46s} {dt * 1e3:9.3f} ms/iter{tf}", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    s, d = 18256, 3072

    # dispatch overhead floor: trivial op, one jit call per iter
    tiny = jnp.ones((8, 128), jnp.bfloat16)
    f = jax.jit(lambda x: x + 1)
    scalar_sync(f(tiny))
    t0 = time.time()
    for _ in range(20):
        out = f(tiny)
    scalar_sync(out)
    print(f"{'per-dispatch overhead (20x tiny op)':46s} {(time.time()-t0)/20*1e3:9.3f} ms/iter")

    w1 = jax.random.normal(key, (d, d), jnp.bfloat16)
    w4 = jax.random.normal(key, (d, 4 * d), jnp.bfloat16)
    w4b = jax.random.normal(key, (4 * d, d), jnp.bfloat16)
    x = jax.random.normal(key, (s, d), jnp.bfloat16)

    timed_loop("matmul [18256,3072]x[3072,3072]",
               lambda c: (c @ w1).astype(jnp.bfloat16), x,
               flops=2 * s * d * d)
    timed_loop("matmul+gelu+matmul (FF)",
               lambda c: (jax.nn.gelu(c @ w4, approximate=True) @ w4b).astype(jnp.bfloat16),
               x, flops=2 * s * 2 * d * 4 * d)

    xt = jax.random.normal(key, (s, 16 * d), jnp.bfloat16)
    wq = jax.random.normal(key, (16 * d, d), jnp.bfloat16)

    # layernorm f32 stats at joint shape
    def ln(c):
        x32 = c.astype(jnp.float32)
        m = jnp.mean(x32, axis=-1, keepdims=True)
        v = jnp.var(x32, axis=-1, keepdims=True)
        return ((x32 - m) * jax.lax.rsqrt(v + 1e-5)).astype(jnp.bfloat16)

    timed_loop("LayerNorm [18256,3072] f32 stats", ln, x)

    # fused qkv [18256,3072]x[3072,9216]
    w9 = jax.random.normal(key, (d, 3 * d), jnp.bfloat16)
    timed_loop("matmul [18256,3072]x[3072,9216] (fused qkv)",
               lambda c: (c @ w9)[:, :d].astype(jnp.bfloat16) + c, x,
               flops=2 * s * d * 3 * d)


if __name__ == "__main__":
    main()

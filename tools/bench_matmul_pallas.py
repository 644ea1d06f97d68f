"""Can a Pallas blocked matmul beat XLA's ~150 TF/s on the DiT dense shapes?

The r3 floor table pins the dense projections at ~150 TF/s best-measured
(FF chain) — 76% of the 197 TF/s bf16 peak, never higher on any real shape.
This probes a hand-blocked Pallas matmul (grid (M/bm, N/bn, K/bk),
k-innermost, f32 VMEM accumulator) against XLA's dot at the production
shapes to see whether the remaining 24% is XLA scheduling or the chip.

Usage: python tools/bench_matmul_pallas.py [iters]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, y_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], y_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def pallas_mm(x, y, bm, bn, bk):
    m, kdim = x.shape
    _, n = y.shape
    nk = kdim // bk
    return pl.pallas_call(
        functools.partial(_mm_kernel, nk=nk),
        grid=(m // bm, n // bn, nk),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                  pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, y)


def timed(name, fn, *args, iters=10, flops=None):
    float(jnp.sum(fn(*args)[:1, :1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    s = 2 * 18256  # CFG-batched B=2 joint rows, padded-ish
    s = (s // 512) * 512
    shapes = [
        ("ff up   [S,3072]x[3072,12288]", s, 3072, 12288),
        ("ff down [S,12288]x[12288,3072]", s, 12288, 3072),
        ("qkv     [S,3072]x[3072,9216]", s, 3072, 9216),
        ("proj    [S,3072]x[3072,3072]", s, 3072, 3072),
    ]
    rng = np.random.default_rng(0)
    for name, m, kdim, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, kdim)) * 0.1, jnp.bfloat16)
        y = jnp.asarray(rng.standard_normal((kdim, n)) * 0.1, jnp.bfloat16)
        fl = 2 * m * kdim * n
        xla = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16))
        timed(f"XLA  {name}", xla, x, y, iters=iters, flops=fl)
        for bm, bn, bk in ((512, 1024, 1024), (1024, 1024, 512),
                           (512, 2048, 512), (2048, 512, 1024)):
            if m % bm or n % bn or kdim % bk:
                continue
            try:
                fn = jax.jit(functools.partial(pallas_mm, bm=bm, bn=bn, bk=bk))
                timed(f"PL {bm}/{bn}/{bk} {name}", fn, x, y, iters=iters,
                      flops=fl)
            except Exception as e:  # noqa: BLE001
                print(f"PL {bm}/{bn}/{bk}: {type(e).__name__} {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()

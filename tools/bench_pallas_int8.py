"""Probe: does Mosaic/Pallas run s8xs8->s32 matmuls at >bf16 rate on the v5e?

Feasibility gate for an int8 score/p@v path inside the packed flash-attention
kernel (the `quant: w8a8` turbo's remaining bf16 component). The probe loop
is the flash inner pipeline itself: scores = q @ k -> requantize -> p @ v,
iterated in a fori_loop entirely in VMEM. The next iteration's q is a narrow
slice of the score matrix — the full matrix is already consumed by the p@v
matmul, so the compiler cannot narrow either matmul, and the slice chain
serializes iterations. For int8 the requantize is the clip/shift the real
kernel would pay; for bf16 it is the cast the shipped kernel pays.

First attempt (chain through a static slice WITHOUT a full-matrix consumer)
measured an impossible 462 TOP/s bf16 — Mosaic narrowed the matmul to the
128 consumed columns. Numbers from this version are physically plausible.

Usage: python tools/bench_pallas_int8.py [iters]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_like_kernel(q_ref, k_ref, v_ref, o_ref, *, acc_t, iters):
    dt_in = q_ref.dtype
    d = q_ref.shape[1]

    def requant(s):
        if dt_in == jnp.int8:
            return jnp.clip(s >> 7, -127, 127).astype(jnp.int8)
        return (s.astype(jnp.float32) * (1.0 / 64.0)).astype(dt_in)

    def body(i, carry):
        q, acc = carry
        s = jax.lax.dot_general(q, k_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=acc_t)
        p = requant(s)
        pv = jax.lax.dot_general(p, v_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=acc_t)
        acc = acc + pv
        q_next = requant(s[:, :d])
        return q_next, acc

    def body2(i, carry):
        # two INDEPENDENT chains per iteration: lets the MXU pipeline
        # across chains (the real kernel's grid steps overlap likewise)
        (qa, acca), (qb, accb) = carry
        return body(i, (qa, acca)), body(i, (qb, accb))

    m = q_ref.shape[0]
    acc0 = jnp.zeros((m, d), acc_t)
    q0 = q_ref[...]
    (_, acc), (_, accb) = jax.lax.fori_loop(
        0, iters, body2, ((q0, acc0), (q0, acc0)))
    o_ref[...] = (acc + accb).astype(jnp.float32)


def pallas_flash_loop(q, k, v, acc_t, iters):
    m, d = q.shape
    return pl.pallas_call(
        functools.partial(_flash_like_kernel, acc_t=acc_t, iters=iters),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


def time_loop(acc_t, q, k, v, iters):
    @jax.jit
    def run(q, k, v):
        out = pallas_flash_loop(q, k, v, acc_t, iters)
        return out[0, 0]

    float(run(q, k, v))  # compile + settle
    t0 = time.perf_counter()
    float(run(q, k, v))  # scalar readback forces completion through the tunnel
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    rng = np.random.default_rng(0)
    # (label, m=q block, n=kv block, d) at the shipped kernel's block shapes
    shapes = [
        ("flash step q2048 kv1024 d128", 2048, 1024, 128),
        ("flash step q2048 kv2048 d128", 2048, 2048, 128),
    ]
    for name, m, n, d in shapes:
        flops = 2 * m * d * n + 2 * m * n * d
        for dt_in, acc in [(jnp.bfloat16, jnp.float32),
                           (jnp.int8, jnp.int32)]:
            if dt_in == jnp.int8:
                q = jnp.asarray(rng.integers(-127, 127, (m, d)), jnp.int8)
                k = jnp.asarray(rng.integers(-127, 127, (d, n)), jnp.int8)
                v = jnp.asarray(rng.integers(-127, 127, (n, d)), jnp.int8)
            else:
                q = jnp.asarray(rng.standard_normal((m, d)), dt_in)
                k = jnp.asarray(rng.standard_normal((d, n)), dt_in)
                v = jnp.asarray(rng.standard_normal((n, d)), dt_in)
            try:
                t = time_loop(acc, q, k, v, iters)
                print(f"{name:34s} {np.dtype(dt_in).name:8s} "
                      f"{t*1e6:9.1f} us  {flops/t/1e12:7.1f} TOP/s")
            except Exception as e:  # noqa: BLE001
                print(f"{name:34s} {np.dtype(dt_in).name:8s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

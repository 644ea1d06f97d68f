"""VPU exp2 throughput ceiling at the attention kernel's block shape.

The packed attention kernel's grid step is max(MXU matmul time, VPU softmax
time) when Mosaic overlaps them (measured: split-pv/pair2 restructurings are
flat, so the overlap is already happening). This probe pins the VPU side: a
Pallas kernel that applies exp2 to a VMEM-resident [rows, 2048] f32 block in
an in-kernel fori_loop (no HBM traffic per iteration), i.e. exactly the
softmax-weight pass shape of one grid step (q_block=2048 rows x packed
2*kv_block=2048 cols). If the measured us/iteration is at or above the
~10.8 us MXU floor per grid step, the attention kernel's per-step floor is
VPU-bound and the shipped ~13 us/step is within (13/floor) of speed of light.

Usage: python tools/bench_vpu_exp2.py [rows] [iters_in_kernel]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n_iter, op):
    def kernel(x_ref, o_ref):
        def body(_, acc):
            if op == "exp2":
                return jnp.exp2(acc * 0.5)
            if op == "exp2_add":  # bias add + exp2 (the actual softmax pass)
                return jnp.exp2(acc * 0.5 + 0.125)
            if op == "mul":  # non-transcendental baseline
                return acc * 1.0000001
            raise ValueError(op)

        o_ref[...] = jax.lax.fori_loop(0, n_iter, body, x_ref[...])

    return kernel


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cols = 2048
    x = jax.random.uniform(jax.random.PRNGKey(0), (rows, cols), jnp.float32,
                           minval=-1.0, maxval=1.0)

    for op in ("mul", "exp2", "exp2_add"):
        fn = pl.pallas_call(
            make_kernel(n_iter, op),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        jit_fn = jax.jit(fn)
        float(jnp.sum(jit_fn(x)))  # compile + warm
        t0 = time.time()
        r = 8
        y = x
        for _ in range(r):
            y = jit_fn(y)  # feed output forward: no dispatch dedup
        float(jnp.sum(y))
        dt = (time.time() - t0) / (r * n_iter)
        gops = rows * cols / dt / 1e9
        print(f"{op:10s} [{rows}x{cols}] f32: {dt*1e6:7.2f} us/pass "
              f"({gops:7.1f} Gelem/s)", flush=True)


if __name__ == "__main__":
    main()

"""Sweep flash-attention kernel block shapes at the 18k joint To2V shape."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from tokensgen_tpu.kernels import attention as A


def main():
    b, h, s, d = 1, 48, 17776, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    bias = jnp.zeros((b, s), jnp.float32)
    flops = b * 4 * s * s * h * d

    ref = None
    for bq, bkv, hblk in [
        (1024, 1024, 2),  # current default
        (512, 1024, 2),
        (2048, 1024, 2),
        (1024, 2048, 2),
        (2048, 2048, 2),
        (1024, 4096, 2),
        (2048, 4096, 2),
        (4096, 2048, 2),
        (1024, 1024, 4),
        (2048, 2048, 4),
        (1024, 2048, 4),
        (512, 512, 2),
    ]:
        if hblk != 2:
            orig = A._flash_attention_tpu
        try:
            fn = jax.jit(functools.partial(
                _run, bq=bq, bkv=bkv, hblk=hblk))
            out = fn(q, k, v, bias)
            float(jnp.sum(out.astype(jnp.float32)))
            t0 = time.time()
            n = 5
            for _ in range(n):
                out = fn(q, k, v, bias)
            float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.time() - t0) / n
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
            print(f"bq={bq:5d} bkv={bkv:5d} hblk={hblk}: {dt*1e3:7.2f} ms  "
                  f"{flops/dt/1e12:5.1f} TF/s  err={err:.2e}", flush=True)
        except Exception as e:
            print(f"bq={bq:5d} bkv={bkv:5d} hblk={hblk}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


def _run(q, k, v, bias, *, bq, bkv, hblk):
    # call the raw tpu path with explicit blocks; replicate wrapper padding
    return _tpu(q, k, v, bias, bq, bkv, hblk)


def _tpu(q, k, v, key_bias, block_q, block_kv, hblk):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, sq, dd = q.shape
    skv = k.shape[2]
    sq_p = A._round_up(sq, block_q)
    skv_p = A._round_up(skv, block_kv)
    has_bias = skv_p != skv
    scale = dd ** -0.5
    q = (q.astype(jnp.float32) * (scale * A._LOG2E)).astype(q.dtype)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    kt = k.transpose(0, 1, 3, 2)
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)),
                       constant_values=A._NEG_INF)
    key_bias = key_bias[:, None, :] * A._LOG2E

    grid = (b, h // hblk, sq_p // block_q, skv_p // block_kv)
    out = pl.pallas_call(
        functools.partial(A._flash_kernel, hblk=hblk, has_bias=has_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hblk, block_q, dd), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, hblk, dd, block_kv), lambda b_, h_, i, j: (b_, h_, 0, j)),
            pl.BlockSpec((1, hblk, block_kv, dd), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, hblk, block_q, dd), lambda b_, h_, i, j: (b_, h_, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, dd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hblk * block_q, A._LANES), jnp.float32),
            pltpu.VMEM((hblk * block_q, A._LANES), jnp.float32),
            pltpu.VMEM((hblk * block_q, dd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, kt, v, key_bias)
    return out[:, :, :sq, :]


if __name__ == "__main__":
    main()

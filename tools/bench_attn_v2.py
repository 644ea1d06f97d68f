"""Experimental flash kernel variants: contiguous per-head scratch (vs strided
interleave) and padding-mask applied only on the final kv block."""

import functools
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

_NEG_INF = -1e9
_LOG2E = 1.4426950408889634
_LANES = 128


def _kernel_v2(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr, *,
               hblk: int, bias_mode: str):
    # scratch: m/l [hblk, Bq, LANES], acc [hblk, Bq, D] — contiguous per head
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    bias = bias_ref[0, 0][None, :] if bias_mode == "full" else None
    scores = []
    for hh in range(hblk):
        s = jax.lax.dot_general(
            q_ref[0, hh], k_ref[0, hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores.append(s + bias if bias is not None else s)

    if bias_mode == "last":
        # padding mask lives entirely in the final kv block
        @pl.when(j == num_kv - 1)
        def _mask():
            for hh in range(hblk):
                scores[hh] += bias_ref[0, 0][None, :]

    for hh, s in enumerate(scores):
        m_prev = m_scr[hh, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[hh, :, :1] = alpha * l_scr[hh, :, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[hh] = alpha * acc_scr[hh] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, hh],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        m_scr[hh, :, :1] = m_new

    @pl.when(j == num_kv - 1)
    def _finalize():
        for hh in range(hblk):
            o_ref[0, hh] = (acc_scr[hh] / l_scr[hh, :, :1]).astype(o_ref.dtype)


def run_v2(q, k, v, key_bias, block_q, block_kv, hblk, bias_mode):
    def _round_up(x, m):
        return (x + m - 1) // m * m

    b, h, sq, dd = q.shape
    skv = k.shape[2]
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_kv)
    scale = dd ** -0.5
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    kt = k.transpose(0, 1, 3, 2)
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)), constant_values=_NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E

    grid = (b, h // hblk, sq_p // block_q, skv_p // block_kv)
    out = pl.pallas_call(
        functools.partial(_kernel_v2, hblk=hblk, bias_mode=bias_mode),
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
            pltpu.VMEM((hblk, block_q, _LANES), jnp.float32),
            pltpu.VMEM((hblk, block_q, _LANES), jnp.float32),
            pltpu.VMEM((hblk, block_q, dd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, kt, v, key_bias)
    return out[:, :, :sq, :]


def main():
    b, h, s, d = 1, 48, 17776, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, h, s, d), jnp.bfloat16)
    bias = jnp.zeros((b, s), jnp.float32)
    flops = b * 4 * s * s * h * d

    from tokensgen_tpu.kernels.attention import flash_attention
    ref = jax.jit(flash_attention)(q, k, v)
    refs = float(jnp.sum(ref.astype(jnp.float32)))
    print(f"baseline kernel checksum {refs:.1f}")

    for bq, bkv, hblk, mode in [
        (1024, 1024, 2, "last"),
        (1024, 1024, 2, "full"),
        (2048, 1024, 2, "last"),
        (1024, 2048, 2, "last"),
        (2048, 2048, 2, "last"),
        (1024, 1024, 4, "last"),
        (2048, 1024, 4, "last"),
        (1024, 1024, 1, "last"),
        (2048, 2048, 1, "last"),
        (4096, 1024, 2, "last"),
        (1024, 4096, 2, "last"),
    ]:
        try:
            fn = jax.jit(functools.partial(run_v2, block_q=bq, block_kv=bkv,
                                           hblk=hblk, bias_mode=mode))
            out = fn(q, k, v, bias)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            t0 = time.time()
            n = 5
            for _ in range(n):
                out = fn(q, k, v, bias)
            float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.time() - t0) / n
            print(f"bq={bq:5d} bkv={bkv:5d} hblk={hblk} {mode:4s}: {dt*1e3:7.2f} ms "
                  f"{flops/dt/1e12:5.1f} TF/s err={err:.2e}", flush=True)
        except Exception as e:
            print(f"bq={bq:5d} bkv={bkv:5d} hblk={hblk} {mode:4s}: FAIL "
                  f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()

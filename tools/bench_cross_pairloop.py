"""Prototype: pair-loop cross-attention kernels vs the shipped pair-innermost.

The shipped cross kernels (smallkv: tv->vip, smallq: vip->all) run 216/432
tiny grid steps; each step refetches a strided [blk, 128] column slice of the
merged q operand (row stride 6144 B -> 256 B bursts). This prototype flips
the structure: the grid covers q blocks only, the q/out DMA is the full-width
contiguous [blk, H*D] row block, K/V stay fully VMEM-resident, and an
in-kernel fori_loop sweeps the 24 head pairs over dynamic 128-lane slices.

Usage: python tools/bench_cross_pairloop.py [iters]
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

from tokensgen_tpu.kernels import attention as A

_LANES = 128
_LOG2E = A._LOG2E


def _smallkv_pairloop_kernel(q_ref, kt_ref, v2_ref, bias_ref,
                             cq_ref, sq_ref, aq_ref, rq_ref, mu_ref,
                             o_ref, *, skv_blk, eps, norm_q, hp):
    d2 = kt_ref.shape[2]
    dh = d2 // 2
    bias = bias_ref[0, 0][None, :]
    cq, sq_t, aq = cq_ref[0], sq_ref[0], aq_ref[0]

    def body(p, carry):
        x32 = q_ref[0, :, pl.ds(p * d2, d2)].astype(jnp.float32)
        if norm_q:
            mu = jax.lax.dot_general(x32, mu_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dlt = x32 - mu
            var = jax.lax.dot_general(dlt * dlt, mu_ref[:],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ln0 = dlt * jax.lax.rsqrt(var + eps)
        else:
            ln0 = x32
        rot = jax.lax.dot_general(ln0, rq_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        qn = (ln0 * cq + rot * sq_t + aq).astype(q_ref.dtype)
        s2 = jax.lax.dot_general(qn, kt_ref[0, p], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ps, ls = [], []
        for hh in range(2):
            s = jnp.minimum(s2[:, hh * skv_blk:(hh + 1) * skv_blk] + bias, 0.0)
            pr = jnp.exp2(s)
            ls.append(jnp.sum(pr, axis=-1, keepdims=True))
            ps.append(pr)
        p2 = jnp.concatenate(ps, axis=1).astype(v2_ref.dtype)
        acc = jax.lax.dot_general(p2, v2_ref[0, p], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        l2 = jnp.where(lanes < dh, ls[0], ls[1])
        l2 = jnp.maximum(l2, jnp.finfo(jnp.float32).tiny)
        o_ref[0, :, pl.ds(p * d2, d2)] = (acc / l2).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, hp, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "block_q", "eps", "norm_q", "norm_k",
                     "interpret"))
def cross_smallkv_pairloop(q, k, v, key_bias, tabs_q, tabs_k, heads: int,
                           block_q: int, eps: float, norm_q: bool,
                           norm_k: bool, interpret: bool = False):
    b, sq, hd = q.shape
    skv = k.shape[1]
    d = hd // heads
    d2 = 2 * d
    hp = heads // 2
    sq_p = A._round_up(sq, block_q)
    skv_p = A._round_up(skv, _LANES)

    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)),
                       constant_values=A._NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E

    cq, sq_t, aq, rq, bq_b = A._cross_norm_tabs(tabs_q, sq_p - sq)
    ck, sk, ak, rk, _ = A._cross_norm_tabs(tabs_k, skv_p - skv)
    cq, sq_t, aq = cq * _LOG2E, sq_t * _LOG2E, aq * _LOG2E
    c_shift = jnp.minimum(
        A._tabs_score_bound(cq, sq_t, aq, rq)
        * A._tabs_score_bound(ck, sk, ak, rk)
        + jnp.maximum(jnp.max(key_bias), 0.0), 120.0)
    key_bias = key_bias - c_shift

    kn = A._apply_prologue_xla(
        k.reshape(b, skv, heads, d).transpose(0, 2, 1, 3), tabs_k, eps,
        norm_k).astype(q.dtype)
    kn = kn.transpose(0, 2, 1, 3).reshape(b, skv, hp, d2).transpose(0, 2, 1, 3)
    kn = jnp.pad(kn, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))
    knt = kn.transpose(0, 1, 3, 2)
    cat = jnp.concatenate
    kt2 = cat([
        cat([knt[:, :, :d], jnp.zeros_like(knt[:, :, :d])], axis=2),
        cat([jnp.zeros_like(knt[:, :, d:]), knt[:, :, d:]], axis=2),
    ], axis=3)
    v4 = vp.reshape(b, skv_p, hp, d2).transpose(0, 2, 1, 3)
    v2b = cat([
        cat([v4[..., :d], jnp.zeros_like(v4[..., :d])], axis=3),
        cat([jnp.zeros_like(v4[..., d:]), v4[..., d:]], axis=3),
    ], axis=2)

    def tab_spec(blk, batched):
        return pl.BlockSpec((1, blk, d2),
                            lambda b_, i_: (b_ if batched else 0, i_, 0))

    grid = (b, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_smallkv_pairloop_kernel, skv_blk=skv_p, eps=eps,
                          norm_q=norm_q, hp=hp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, hp, d2, 2 * skv_p), lambda b_, i: (b_, 0, 0, 0)),
            pl.BlockSpec((1, hp, 2 * skv_p, d2), lambda b_, i: (b_, 0, 0, 0)),
            pl.BlockSpec((1, 1, skv_p), lambda b_, i: (b_, 0, 0)),
            tab_spec(block_q, bq_b),
            tab_spec(block_q, bq_b),
            tab_spec(block_q, bq_b),
            pl.BlockSpec((d2, d2), lambda b_, i: (0, 0)),
            pl.BlockSpec((d2, d2), lambda b_, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp, kt2, v2b, key_bias, cq, sq_t, aq, rq, A._mu_packed(d2))
    return out[:, :sq, :]


def timed(name, fn, *args, iters=10):
    float(jnp.sum(fn(*args).astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(f"{name:46s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    b = int(os.environ.get("B", "1"))
    f, hp_, wp_ = 13, 30, 45
    s_text, s_vip = 226, 480
    sq = s_text + f * hp_ * wp_
    heads, d = 48, 64
    hd = heads * d
    q = jax.random.normal(jax.random.PRNGKey(0), (b, sq, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s_vip, hd), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s_vip, hd), jnp.bfloat16)
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (d,))) + 0.5
    bs_ = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (d,))

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp_),
                                      np.arange(wp_))
    vip_rope = get_3d_rotary_pos_embed_v2(d, np.arange(5) + 1000, np.arange(8),
                                          np.arange(12))
    tq = A.make_prologue(d, [(None, s_text), (rope, sq - s_text)], g, bs_,
                         fold=d**-0.5)
    tk = A.make_prologue(d, [(vip_rope, s_vip)], g, bs_)
    zb = jnp.zeros((b, s_vip), jnp.float32)

    ship = jax.jit(lambda *a: A._flash_cross_smallkv_tpu(
        *a, heads, 2048, 1e-6, True, True))
    t0 = timed(f"shipped smallkv (B={b})", ship, q, k, v, zb, tq, tk,
               iters=iters)
    for bq in (1024, 2048, 4096):
        try:
            fn = jax.jit(lambda *a, b1=bq: cross_smallkv_pairloop(
                *a, heads, b1, 1e-6, True, True))
            t1 = timed(f"pair-loop smallkv bq={bq} (B={b})", fn, q, k, v, zb,
                       tq, tk, iters=iters)
            print(f"  speedup vs shipped: {t0 / t1:.2f}x", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq}: {type(e).__name__} {str(e)[:160]}", flush=True)

    o1 = ship(q, k, v, zb, tq, tk).astype(jnp.float32)
    o2 = cross_smallkv_pairloop(q, k, v, zb, tq, tk, heads, 2048, 1e-6,
                                True, True).astype(jnp.float32)
    print(f"pair-loop vs shipped max |d|: "
          f"{float(jnp.max(jnp.abs(o1 - o2))):.2e}", flush=True)


if __name__ == "__main__":
    main()

"""Round-3 attention perf experiments at the 18k production shape.

Variants of the packed head-pair kernel's no_max inner loop:
  * shipped: per-half exp2 -> concat -> ONE [Bq,2Bk]x[2Bk,128] p@v matmul
  * split-pv: per-half exp2 -> per-half [Bq,Bk]x[Bk,128] p@v (the block-diag
    v2 scratch makes each half-matmul produce the correct half-lanes) — the
    scheduler can overlap half B's VPU softmax with half A's MXU p@v
  * pair2: TWO head pairs per grid step (4 heads) — cross-chain MXU/VPU overlap
    at the cost of doubled persistent VMEM scratch

Also times the two VIP cross-attention calls (17776->480 and 480->18256) and
the XLA glue around them as used by `JointVIPAttention` func_type "1".

Usage: python tools/bench_attn_r3.py [variant ...]
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


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return [float(jnp.sum(x.astype(jnp.float32))) for x in leaves
            if hasattr(x, "astype")]


def timed(name, fn, *args, iters=10, flops=None):
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / iters
    tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:52s} {dt * 1e3:9.2f} ms{tf}", flush=True)
    return dt


# --------------------------------------------------------------------------
# split-pv variant: identical to _flash_packed_kernel except the no_max p@v
# runs as two half-matmuls so half B's softmax overlaps half A's matmul
# --------------------------------------------------------------------------


def _packed_kernel_splitpv(
    q_ref, k_ref, v_ref, bias_ref,
    cq_ref, sq_ref, aq_ref, rq_ref,
    ck_ref, sk_ref, ak_ref, rk_ref, mu_ref,
    o_ref, m_scr, l_scr, acc_scr, qn_scr, kt_scr, v2_scr, *,
    has_bias: bool, block_kv: int, eps: float, norm_q: bool, norm_k: bool,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)
    d2 = q_ref.shape[-1]
    dh = d2 // 2

    def prologue(x, cos_t, sin_t, add_t, rg, normalize):
        x32 = x.astype(jnp.float32)
        if normalize:
            mu = jax.lax.dot_general(x32, mu_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dlt = x32 - mu
            var = jax.lax.dot_general(dlt * dlt, mu_ref[:], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            ln0 = dlt * jax.lax.rsqrt(var + eps)
        else:
            ln0 = x32
        rot = jax.lax.dot_general(ln0, rg, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return (ln0 * cos_t + rot * sin_t + add_t).astype(q_ref.dtype)

    @pl.when(j == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        qn_scr[:] = prologue(q_ref[0, 0], cq_ref[0], sq_ref[0], aq_ref[0],
                             rq_ref[:], norm_q)

    @pl.when(i == 0)
    def _prep_kv():
        kn = prologue(k_ref[0, 0], ck_ref[0], sk_ref[0], ak_ref[0],
                      rk_ref[:], norm_k)
        knt = kn.T
        rows = jax.lax.broadcasted_iota(jnp.int32, knt.shape, 0)
        kt_scr[:, pl.ds(2 * j * block_kv, block_kv)] = jnp.where(
            rows < dh, knt, 0).astype(knt.dtype)
        kt_scr[:, pl.ds(2 * j * block_kv + block_kv, block_kv)] = jnp.where(
            rows >= dh, knt, 0).astype(knt.dtype)
        v2 = v_ref[0, 0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, v2.shape, 1)
        v2_scr[pl.ds(2 * j * block_kv, block_kv), :] = jnp.where(lanes < dh, v2, 0)
        v2_scr[pl.ds(2 * j * block_kv + block_kv, block_kv), :] = jnp.where(
            lanes >= dh, v2, 0)

    s2 = jax.lax.dot_general(
        qn_scr[:], kt_scr[:, pl.ds(2 * j * block_kv, 2 * block_kv)],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    bias = bias_ref[0, 0][None, :] if has_bias else None
    lanes = jax.lax.broadcasted_iota(jnp.int32, acc_scr.shape, 1)
    for hh in range(2):
        s = jnp.minimum(s2[:, hh * block_kv:(hh + 1) * block_kv] + bias, 0.0)
        p = jnp.exp2(s)
        l_scr[hh, :, :1] = l_scr[hh, :, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v2_scr[pl.ds((2 * j + hh) * block_kv, block_kv), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_kv - 1)
    def _finalize():
        l2 = jnp.where(lanes < dh, l_scr[0, :, :1], l_scr[1, :, :1])
        l2 = jnp.maximum(l2, jnp.finfo(jnp.float32).tiny)
        o_ref[0, 0] = (acc_scr[:] / l2).astype(o_ref.dtype)


def run_splitpv(q, k, v, key_bias, tabs_q, tabs_k, heads, block_q, block_kv,
                eps=1e-6):
    b, sq, hd = q.shape
    skv = k.shape[1]
    d = hd // heads
    hp = heads // 2
    sq_p = A._round_up(sq, block_q)
    skv_p = A._round_up(skv, block_kv)
    has_bias = skv_p != skv

    def pack(x, s, s_p):
        x = x.reshape(b, s, hp, 2 * d).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_p - s), (0, 0)))

    qp, kp, vp = pack(q, sq, sq_p), pack(k, skv, skv_p), pack(v, skv, skv_p)
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)),
                       constant_values=A._NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E

    def norm_tabs(tabs, pad):
        cosg, sin, add, rg = A._pack_tabs(tabs)
        batched = cosg.ndim == 3
        cosg, sin, add, rg = A._pad_tabs((cosg, sin, add, rg), pad, batched)
        if not batched:
            cosg, sin, add = cosg[None], sin[None], add[None]
        return cosg, sin, add, rg, (cosg.shape[0] != 1)

    cq, sq_t, aq, rq, bq_b = norm_tabs(tabs_q, sq_p - sq)
    ck, sk, ak, rk, bk_b = norm_tabs(tabs_k, skv_p - skv)
    cq, sq_t, aq = cq * _LOG2E, sq_t * _LOG2E, aq * _LOG2E

    c_shift = jnp.minimum(
        A._tabs_score_bound(cq, sq_t, aq, rq) * A._tabs_score_bound(ck, sk, ak, rk)
        + jnp.maximum(jnp.max(key_bias), 0.0), 120.0)
    key_bias = key_bias - c_shift
    has_bias = True

    d2 = 2 * d
    mu = jnp.block([
        [jnp.full((d, d), 1.0 / d, jnp.float32), jnp.zeros((d, d), jnp.float32)],
        [jnp.zeros((d, d), jnp.float32), jnp.full((d, d), 1.0 / d, jnp.float32)],
    ])

    def tab_spec(blk, batched, kv):
        def imap(b_, h_, i_, j_):
            pos = j_ if kv else i_
            return (b_ if batched else 0, pos, 0)
        return pl.BlockSpec((1, blk, d2), imap)

    grid = (b, hp, sq_p // block_q, skv_p // block_kv)
    out = pl.pallas_call(
        functools.partial(_packed_kernel_splitpv, has_bias=has_bias,
                          block_kv=block_kv, eps=eps, norm_q=True, norm_k=True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d2), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d2), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d2), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j)),
            tab_spec(block_q, bq_b, False),
            tab_spec(block_q, bq_b, False),
            tab_spec(block_q, bq_b, False),
            pl.BlockSpec((d2, d2), lambda b_, h_, i, j: (0, 0)),
            tab_spec(block_kv, bk_b, True),
            tab_spec(block_kv, bk_b, True),
            tab_spec(block_kv, bk_b, True),
            pl.BlockSpec((d2, d2), lambda b_, h_, i, j: (0, 0)),
            pl.BlockSpec((d2, d2), lambda b_, h_, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d2),
                               lambda b_, h_, i, j: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, sq_p, d2), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_q, _LANES), jnp.float32),
            pltpu.VMEM((2, block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d2), jnp.float32),
            pltpu.VMEM((block_q, d2), q.dtype),
            pltpu.VMEM((d2, 2 * skv_p), q.dtype),
            pltpu.VMEM((2 * skv_p, d2), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qp, kp, vp, key_bias, cq, sq_t, aq, rq, ck, sk, ak, rk, mu)
    out = out[:, :, :sq, :].transpose(0, 2, 1, 3).reshape(b, sq, hd)
    return out


# --------------------------------------------------------------------------
# pair2 variant: TWO head pairs (4 heads) per grid step — the two chains are
# independent, so pair B's MXU matmuls can overlap pair A's VPU softmax
# --------------------------------------------------------------------------


def _packed_kernel_pair2(
    q_ref, k_ref, v_ref, bias_ref,
    cq_ref, sq_ref, aq_ref, rq_ref,
    ck_ref, sk_ref, ak_ref, rk_ref, mu_ref,
    o_ref, l_scr, acc_scr, qn_scr, kt_scr, v2_scr, *,
    has_bias: bool, block_kv: int, eps: float,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)
    d2 = q_ref.shape[-1]
    dh = d2 // 2

    def prologue(x, cos_t, sin_t, add_t, rg):
        x32 = x.astype(jnp.float32)
        mu = jax.lax.dot_general(x32, mu_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dlt = x32 - mu
        var = jax.lax.dot_general(dlt * dlt, mu_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ln0 = dlt * jax.lax.rsqrt(var + eps)
        rot = jax.lax.dot_general(ln0, rg, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return (ln0 * cos_t + rot * sin_t + add_t).astype(q_ref.dtype)

    @pl.when(j == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        for pp in range(2):
            qn_scr[pp] = prologue(q_ref[0, pp], cq_ref[0], sq_ref[0],
                                  aq_ref[0], rq_ref[:])

    @pl.when(i == 0)
    def _prep_kv():
        for pp in range(2):
            kn = prologue(k_ref[0, pp], ck_ref[0], sk_ref[0], ak_ref[0],
                          rk_ref[:])
            knt = kn.T
            rows = jax.lax.broadcasted_iota(jnp.int32, knt.shape, 0)
            kt_scr[pp, :, pl.ds(2 * j * block_kv, block_kv)] = jnp.where(
                rows < dh, knt, 0).astype(knt.dtype)
            kt_scr[pp, :, pl.ds(2 * j * block_kv + block_kv, block_kv)] = jnp.where(
                rows >= dh, knt, 0).astype(knt.dtype)
            v2 = v_ref[0, pp]
            lanes_v = jax.lax.broadcasted_iota(jnp.int32, v2.shape, 1)
            v2_scr[pp, pl.ds(2 * j * block_kv, block_kv), :] = jnp.where(
                lanes_v < dh, v2, 0)
            v2_scr[pp, pl.ds(2 * j * block_kv + block_kv, block_kv), :] = jnp.where(
                lanes_v >= dh, v2, 0)

    bias = bias_ref[0, 0][None, :] if has_bias else None
    lanes = jax.lax.broadcasted_iota(jnp.int32, acc_scr.shape[1:], 1)
    # issue both pairs' score matmuls first (ILP), then softmax+pv per pair
    s2s = [jax.lax.dot_general(
        qn_scr[pp], kt_scr[pp, :, pl.ds(2 * j * block_kv, 2 * block_kv)],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        for pp in range(2)]
    for pp in range(2):
        s2 = s2s[pp]
        ps = []
        for hh in range(2):
            s = jnp.minimum(s2[:, hh * block_kv:(hh + 1) * block_kv] + bias, 0.0)
            p = jnp.exp2(s)
            l_scr[pp, hh, :, :1] = l_scr[pp, hh, :, :1] + jnp.sum(
                p, axis=-1, keepdims=True)
            ps.append(p)
        p2 = jnp.concatenate(ps, axis=1).astype(v_ref.dtype)
        acc_scr[pp] = acc_scr[pp] + jax.lax.dot_general(
            p2, v2_scr[pp, pl.ds(2 * j * block_kv, 2 * block_kv), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == num_kv - 1)
    def _finalize():
        for pp in range(2):
            l2 = jnp.where(lanes < dh, l_scr[pp, 0, :, :1], l_scr[pp, 1, :, :1])
            l2 = jnp.maximum(l2, jnp.finfo(jnp.float32).tiny)
            o_ref[0, pp] = (acc_scr[pp] / l2).astype(o_ref.dtype)


def run_pair2(q, k, v, key_bias, tabs_q, tabs_k, heads, block_q, block_kv,
              eps=1e-6):
    b, sq, hd = q.shape
    skv = k.shape[1]
    d = hd // heads
    hp = heads // 2
    assert hp % 2 == 0
    sq_p = A._round_up(sq, block_q)
    skv_p = A._round_up(skv, block_kv)

    def pack(x, s, s_p):
        x = x.reshape(b, s, hp, 2 * d).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_p - s), (0, 0)))

    qp, kp, vp = pack(q, sq, sq_p), pack(k, skv, skv_p), pack(v, skv, skv_p)
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)),
                       constant_values=A._NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E

    def norm_tabs(tabs, pad):
        cosg, sin, add, rg = A._pack_tabs(tabs)
        batched = cosg.ndim == 3
        cosg, sin, add, rg = A._pad_tabs((cosg, sin, add, rg), pad, batched)
        if not batched:
            cosg, sin, add = cosg[None], sin[None], add[None]
        return cosg, sin, add, rg, (cosg.shape[0] != 1)

    cq, sq_t, aq, rq, bq_b = norm_tabs(tabs_q, sq_p - sq)
    ck, sk, ak, rk, bk_b = norm_tabs(tabs_k, skv_p - skv)
    cq, sq_t, aq = cq * _LOG2E, sq_t * _LOG2E, aq * _LOG2E
    c_shift = jnp.minimum(
        A._tabs_score_bound(cq, sq_t, aq, rq) * A._tabs_score_bound(ck, sk, ak, rk)
        + jnp.maximum(jnp.max(key_bias), 0.0), 120.0)
    key_bias = key_bias - c_shift

    d2 = 2 * d
    mu = jnp.block([
        [jnp.full((d, d), 1.0 / d, jnp.float32), jnp.zeros((d, d), jnp.float32)],
        [jnp.zeros((d, d), jnp.float32), jnp.full((d, d), 1.0 / d, jnp.float32)],
    ])

    def tab_spec(blk, batched, kv):
        def imap(b_, h_, i_, j_):
            pos = j_ if kv else i_
            return (b_ if batched else 0, pos, 0)
        return pl.BlockSpec((1, blk, d2), imap)

    grid = (b, hp // 2, sq_p // block_q, skv_p // block_kv)
    out = pl.pallas_call(
        functools.partial(_packed_kernel_pair2, has_bias=True,
                          block_kv=block_kv, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, block_q, d2), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 2, block_kv, d2), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 2, block_kv, d2), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j)),
            tab_spec(block_q, bq_b, False),
            tab_spec(block_q, bq_b, False),
            tab_spec(block_q, bq_b, False),
            pl.BlockSpec((d2, d2), lambda b_, h_, i, j: (0, 0)),
            tab_spec(block_kv, bk_b, True),
            tab_spec(block_kv, bk_b, True),
            tab_spec(block_kv, bk_b, True),
            pl.BlockSpec((d2, d2), lambda b_, h_, i, j: (0, 0)),
            pl.BlockSpec((d2, d2), lambda b_, h_, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, block_q, d2),
                               lambda b_, h_, i, j: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, sq_p, d2), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, block_q, _LANES), jnp.float32),
            pltpu.VMEM((2, block_q, d2), jnp.float32),
            pltpu.VMEM((2, block_q, d2), q.dtype),
            pltpu.VMEM((2, d2, 2 * skv_p), q.dtype),
            pltpu.VMEM((2, 2 * skv_p, d2), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(qp, kp, vp, key_bias, cq, sq_t, aq, rq, ck, sk, ak, rk, mu)
    out = out[:, :, :sq, :].transpose(0, 2, 1, 3).reshape(b, sq, hd)
    return out


def main():
    b = 1
    f, hp_, wp_ = 13, 30, 45
    s_text, s_vip = 226, 480
    sq = s_text + f * hp_ * wp_  # 17,776
    heads, d = 48, 64
    hd = heads * d
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, sq, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, sq, hd), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, sq, hd), jnp.bfloat16)
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (d,))) + 0.5
    bs_ = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (d,))

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp_), np.arange(wp_))
    segs = [(None, s_text), (rope, sq - s_text)]
    tq = A.make_prologue(d, segs, g, bs_, fold=d**-0.5)
    tk = A.make_prologue(d, segs, g, bs_)
    zb = jnp.zeros((b, sq), jnp.float32)
    fl = 4 * b * sq * sq * hd

    # NB: operands must be ARGUMENTS, not closures — closed-over arrays are
    # baked into the HLO as constants and the remote compile helper rejects
    # the multi-hundred-MB upload (HTTP 413)
    shipped = jax.jit(lambda q_, k_, v_, tq_, tk_: A._flash_fused_packed_tpu(
        q_, k_, v_, zb, tq_, tk_, heads, 2048, 1024, False, 1e-6, True, True))
    t_ship = timed("shipped packed (q2048/kv1024)", shipped, q, k, v, tq, tk,
                   flops=fl)

    splitpv = jax.jit(lambda q_, k_, v_, tq_, tk_: run_splitpv(
        q_, k_, v_, zb, tq_, tk_, heads, 2048, 1024))
    t_split = timed("split-pv packed (q2048/kv1024)", splitpv, q, k, v, tq, tk,
                    flops=fl)

    # accuracy of the variant
    o1, o2 = shipped(q, k, v, tq, tk), splitpv(q, k, v, tq, tk)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    print(f"split-pv vs shipped max |d|: {err:.2e}", flush=True)

    # block sweeps on the faster of the two
    for bq_, bkv_ in ((2048, 512), (4096, 1024), (1024, 1024), (2048, 2048)):
        try:
            fn = jax.jit(lambda q_, k_, v_, tq_, tk_, b1=bq_, b2=bkv_: run_splitpv(
                q_, k_, v_, zb, tq_, tk_, heads, b1, b2))
            timed(f"split-pv q{bq_}/kv{bkv_}", fn, q, k, v, tq, tk, flops=fl)
        except Exception as e:
            print(f"q{bq_}/kv{bkv_}: {type(e).__name__} {str(e)[:120]}", flush=True)

    # two head pairs per step
    for bq_, bkv_ in ((2048, 1024), (1024, 1024)):
        try:
            fn = jax.jit(lambda q_, k_, v_, tq_, tk_, b1=bq_, b2=bkv_: run_pair2(
                q_, k_, v_, zb, tq_, tk_, heads, b1, b2))
            timed(f"pair2 q{bq_}/kv{bkv_}", fn, q, k, v, tq, tk, flops=fl)
            if bq_ == 2048:
                o3 = fn(q, k, v, tq, tk)
                err2 = float(jnp.max(jnp.abs(
                    o1.astype(jnp.float32) - o3.astype(jnp.float32))))
                print(f"pair2 vs shipped max |d|: {err2:.2e}", flush=True)
        except Exception as e:
            print(f"pair2 q{bq_}/kv{bkv_}: {type(e).__name__} {str(e)[:150]}",
                  flush=True)

    # ---- VIP cross-attn costs at production shape (func_type "1") ----
    kv_ = jax.random.normal(jax.random.PRNGKey(5), (b, s_vip, hd), jnp.bfloat16)
    vv_ = jax.random.normal(jax.random.PRNGKey(6), (b, s_vip, hd), jnp.bfloat16)
    cond_rope = get_3d_rotary_pos_embed_v2(d, np.arange(5) + 1000, np.arange(8),
                                           np.arange(12))
    vip_rope = get_3d_rotary_pos_embed_v2(d, np.arange(f) + 1000, np.arange(hp_),
                                          np.arange(wp_))
    vsegs = [(None, s_text), (vip_rope, sq - s_text), (cond_rope, s_vip)]
    vtq = A.make_prologue(d, vsegs, g, bs_, fold=d**-0.5)
    vtk = A.make_prologue(d, vsegs, g, bs_)
    tq_tv = A.slice_tabs(vtq, 0, sq)
    tk_vip = A.slice_tabs(vtk, sq, sq + s_vip)
    tq_vip = A.slice_tabs(vtq, sq, sq + s_vip)

    cross1 = jax.jit(lambda q_, k2, v2, tq_, tk_: A.fused_flash_attention(
        q_, k2, v2, tq_, tk_, heads=heads))
    timed("vip cross1 17776->480", cross1, q, kv_, vv_, tq_tv, tk_vip,
          flops=4 * b * sq * s_vip * hd)
    # fewer, bigger grid steps: the small-kv cross is per-step-overhead bound
    for bq_ in (2048, 4096):
        fn = jax.jit(lambda q_, k2, v2, tq_, tk_, b1=bq_: A.fused_flash_attention(
            q_, k2, v2, tq_, tk_, heads=heads, block_q=b1))
        timed(f"vip cross1 block_q={bq_} (bq={2*bq_})", fn, q, kv_, vv_,
              tq_tv, tk_vip, flops=4 * b * sq * s_vip * hd)
    # pair2 on the cross shape
    for bq_ in (2048, 4096):
        try:
            fn = jax.jit(lambda q_, k2, v2, tq_, tk_, b1=bq_: run_pair2(
                q_, k2, v2, jnp.zeros((b, s_vip), jnp.float32), tq_, tk_,
                heads, b1, 512))
            timed(f"vip cross1 pair2 q{bq_}/kv512", fn, q, kv_, vv_,
                  tq_tv, tk_vip, flops=4 * b * sq * s_vip * hd)
        except Exception as e:
            print(f"cross1 pair2 q{bq_}: {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    qv = jax.random.normal(jax.random.PRNGKey(7), (b, s_vip, hd), jnp.bfloat16)
    kcat = jnp.concatenate([k, kv_], axis=1)
    vcat = jnp.concatenate([v, vv_], axis=1)
    tk_all = vtk
    cross2 = jax.jit(lambda qv_, kc, vc, tq_, tk_: A.fused_flash_attention(
        qv_, kc, vc, tq_, tk_, heads=heads))
    timed("vip cross2 480->18256 (pre-concat kv)", cross2, qv, kcat, vcat,
          tq_vip, tk_all, flops=4 * b * s_vip * (sq + s_vip) * hd)
    for bkv_ in (2048, 4096):
        fn = jax.jit(lambda qv_, kc, vc, tq_, tk_, b2=bkv_: A.fused_flash_attention(
            qv_, kc, vc, tq_, tk_, heads=heads, block_kv=b2))
        timed(f"vip cross2 block_kv={bkv_}", fn, qv, kcat, vcat,
              tq_vip, tk_all, flops=4 * b * s_vip * (sq + s_vip) * hd)
    for bkv_ in (2048, 4096):
        try:
            fn = jax.jit(lambda qv_, kc, vc, tq_, tk_, b2=bkv_: run_pair2(
                qv_, kc, vc, jnp.zeros((b, sq + s_vip), jnp.float32), tq_, tk_,
                heads, 512, b2))
            timed(f"vip cross2 pair2 q512/kv{bkv_}", fn, qv, kcat, vcat,
                  tq_vip, tk_all, flops=4 * b * s_vip * (sq + s_vip) * hd)
        except Exception as e:
            print(f"cross2 pair2 kv{bkv_}: {type(e).__name__} {str(e)[:120]}",
                  flush=True)

    def cross_both(q_, k_, v_, qv_, kv2, vv2, t1, t2, t3, t4):
        kc = jnp.concatenate([k_, kv2], axis=1)
        vc = jnp.concatenate([v_, vv2], axis=1)
        c1 = A.fused_flash_attention(q_, kv2, vv2, t1, t2, heads=heads)
        c2 = A.fused_flash_attention(qv_, kc, vc, t3, t4, heads=heads)
        return c1, c2
    timed("vip cross1+2 incl. concats (as in the model)",
          jax.jit(cross_both), q, k, v, qv, kv_, vv_, tq_tv, tk_vip, tq_vip,
          tk_all, flops=4 * b * (sq * s_vip + s_vip * (sq + s_vip)) * hd)


if __name__ == "__main__":
    main()

"""Round-3 VIP cross-attention kernels: grid-swapped head-innermost variants.

The shipped packed kernel's grid is (b, pair, i_q, j_kv) — the prologue
tables (3x f32 [blk, 128]) are re-fetched for every pair because the table
index depends on i/j which change between pair sweeps. At the VIP cross
shapes that table traffic dominates:

  cross1 17776->480:  q tables 3*17776*128*4 B * 24 pairs = 655 MB / call
  cross2 480->18256:  k tables 3*18432*128*4 B * 24 pairs = 680 MB / call

Variants here make the PAIR axis innermost so consecutive grid steps keep
the same table index and Pallas elides the DMA (tables fetched once per
block instead of once per block*pair):

  * smallkv: grid (b, i_q, pair), kv fits ONE block — K^T/V2 block-diagonal
    operands are pre-built in XLA (kv is tiny), no scratch, no @pl.when.
  * smallq: grid (b, j_kv, pair), q fits ONE block — per-pair (acc, l)
    persist in scratch across the j sweep; k-side prologue runs in-kernel.

Usage: python tools/bench_cross_r3.py
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


def timed(name, fn, *args, iters=20, flops=None):
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / iters
    tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:52s} {dt * 1e3:9.2f} ms{tf}", flush=True)
    return dt


def _norm_tabs(tabs, pad):
    cosg, sin, add, rg = A._pack_tabs(tabs)
    batched = cosg.ndim == 3
    cosg, sin, add, rg = A._pad_tabs((cosg, sin, add, rg), pad, batched)
    if not batched:
        cosg, sin, add = cosg[None], sin[None], add[None]
    return cosg, sin, add, rg, (cosg.shape[0] != 1)


def _mu(d2):
    d = d2 // 2
    return jnp.block([
        [jnp.full((d, d), 1.0 / d, jnp.float32), jnp.zeros((d, d), jnp.float32)],
        [jnp.zeros((d, d), jnp.float32), jnp.full((d, d), 1.0 / d, jnp.float32)],
    ])


# --------------------------------------------------------------------------
# smallkv: q sweeps, whole (pre-prologued, block-diagonal) K/V per pair
# --------------------------------------------------------------------------


def _smallkv_kernel(q_ref, kt_ref, v2_ref, bias_ref,
                    cq_ref, sq_ref, aq_ref, rq_ref, mu_ref, o_ref, *,
                    skv_blk: int, eps: float, norm_q: bool):
    x32 = q_ref[0].astype(jnp.float32)
    if norm_q:
        mu = jax.lax.dot_general(x32, mu_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dlt = x32 - mu
        var = jax.lax.dot_general(dlt * dlt, mu_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ln0 = dlt * jax.lax.rsqrt(var + eps)
    else:
        ln0 = x32
    rot = jax.lax.dot_general(ln0, rq_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qn = (ln0 * cq_ref[0] + rot * sq_ref[0] + aq_ref[0]).astype(q_ref.dtype)
    s2 = jax.lax.dot_general(qn, kt_ref[0, 0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    bias = bias_ref[0, 0][None, :]
    ps, ls = [], []
    for hh in range(2):
        s = jnp.minimum(s2[:, hh * skv_blk:(hh + 1) * skv_blk] + bias, 0.0)
        p = jnp.exp2(s)
        ls.append(jnp.sum(p, axis=-1, keepdims=True))
        ps.append(p)
    p2 = jnp.concatenate(ps, axis=1).astype(v2_ref.dtype)
    acc = jax.lax.dot_general(p2, v2_ref[0, 0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    d2 = q_ref.shape[-1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    l2 = jnp.where(lanes < d2 // 2, ls[0], ls[1])
    l2 = jnp.maximum(l2, jnp.finfo(jnp.float32).tiny)
    o_ref[0] = (acc / l2).astype(o_ref.dtype)


def run_smallkv(q, k, v, key_bias, tabs_q, tabs_k, heads, block_q,
                eps=1e-6, norm_q=True, norm_k=True):
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

    cq, sq_t, aq, rq, bq_b = _norm_tabs(tabs_q, sq_p - sq)
    ck, sk, ak, rk, bk_b = _norm_tabs(tabs_k, skv_p - skv)
    cq, sq_t, aq = cq * _LOG2E, sq_t * _LOG2E, aq * _LOG2E

    c_shift = jnp.minimum(
        A._tabs_score_bound(cq, sq_t, aq, rq)
        * A._tabs_score_bound(ck, sk, ak, rk)
        + jnp.maximum(jnp.max(key_bias), 0.0), 120.0)
    key_bias = key_bias - c_shift

    # K/V are tiny: prologue + block-diagonal packing in plain XLA. The
    # LayerNorm is per-HEAD (d=64), so run it on unpacked [b, H, skv, d]
    # with the UNPACKED tables, then pack to head-pair layout.
    kn = A._apply_prologue_xla(
        k.reshape(b, skv, heads, d).transpose(0, 2, 1, 3), tabs_k, eps,
        norm_k).astype(q.dtype)  # [b, H, skv, d]
    kn = kn.transpose(0, 2, 1, 3).reshape(b, skv, hp, d2).transpose(0, 2, 1, 3)
    kn = jnp.pad(kn, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))
    half = jnp.concatenate
    knt = kn.transpose(0, 1, 3, 2)  # [b, hp, d2, skv_p]
    kt2 = half([
        half([knt[:, :, :d], jnp.zeros_like(knt[:, :, :d])], axis=2),
        half([jnp.zeros_like(knt[:, :, d:]), knt[:, :, d:]], axis=2),
    ], axis=3)  # [b, hp, d2, 2*skv_p] block-diagonal
    v4 = vp.reshape(b, skv_p, hp, d2).transpose(0, 2, 1, 3)
    v2b = half([
        half([v4[..., :d], jnp.zeros_like(v4[..., :d])], axis=3),
        half([jnp.zeros_like(v4[..., d:]), v4[..., d:]], axis=3),
    ], axis=2)  # [b, hp, 2*skv_p, d2]

    def tab_spec(blk, batched):
        return pl.BlockSpec((1, blk, d2),
                            lambda b_, i_, h_: (b_ if batched else 0, i_, 0))

    grid = (b, sq_p // block_q, hp)
    out = pl.pallas_call(
        functools.partial(_smallkv_kernel, skv_blk=skv_p, eps=eps,
                          norm_q=norm_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d2), lambda b_, i, h_: (b_, i, h_)),
            pl.BlockSpec((1, 1, d2, 2 * skv_p), lambda b_, i, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, 2 * skv_p, d2), lambda b_, i, h_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, skv_p), lambda b_, i, h_: (b_, 0, 0)),
            tab_spec(block_q, bq_b),
            tab_spec(block_q, bq_b),
            tab_spec(block_q, bq_b),
            pl.BlockSpec((d2, d2), lambda b_, i, h_: (0, 0)),
            pl.BlockSpec((d2, d2), lambda b_, i, h_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d2), lambda b_, i, h_: (b_, i, h_)),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qp, kt2, v2b, key_bias, cq, sq_t, aq, rq, _mu(d2))
    return out[:, :sq, :]


# --------------------------------------------------------------------------
# smallq: kv sweeps with pair-innermost grid; per-pair acc/l in scratch
# --------------------------------------------------------------------------


def _smallq_kernel(q_ref, k_ref, v_ref, bias_ref,
                   cq_ref, sq_ref, aq_ref, rq_ref,
                   ck_ref, sk_ref, ak_ref, rk_ref, mu_ref,
                   o_ref, acc_scr, l_scr, *,
                   block_kv: int, eps: float, norm_q: bool, norm_k: bool):
    j = pl.program_id(1)
    h = pl.program_id(2)
    num_kv = pl.num_programs(1)
    d2 = q_ref.shape[-1]
    dh = d2 // 2

    def prologue(x, cos_t, sin_t, add_t, normalize):
        x32 = x.astype(jnp.float32)
        if normalize:
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
        return (ln0 * cos_t + rot * sin_t + add_t).astype(q_ref.dtype)

    @pl.when(j == 0)
    def _init():
        acc_scr[h] = jnp.zeros_like(acc_scr[h])
        l_scr[h] = jnp.zeros_like(l_scr[h])

    qn = prologue(q_ref[0], cq_ref[0], sq_ref[0], aq_ref[0], norm_q)
    kn = prologue(k_ref[0], ck_ref[0], sk_ref[0], ak_ref[0], norm_k)
    knt = kn.T  # [d2, Bk]
    rows = jax.lax.broadcasted_iota(jnp.int32, knt.shape, 0)
    kt2 = jnp.concatenate([jnp.where(rows < dh, knt, 0),
                           jnp.where(rows >= dh, knt, 0)], axis=1)  # [d2, 2Bk]
    v = v_ref[0]
    lanes_v = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    v2 = jnp.concatenate([jnp.where(lanes_v < dh, v, 0),
                          jnp.where(lanes_v >= dh, v, 0)], axis=0)  # [2Bk, d2]

    s2 = jax.lax.dot_general(qn, kt2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    bias = bias_ref[0, 0][None, :]
    ps = []
    for hh in range(2):
        s = jnp.minimum(s2[:, hh * block_kv:(hh + 1) * block_kv] + bias, 0.0)
        p = jnp.exp2(s)
        l_scr[h, hh, :, :1] = l_scr[h, hh, :, :1] + jnp.sum(
            p, axis=-1, keepdims=True)
        ps.append(p)
    p2 = jnp.concatenate(ps, axis=1).astype(v_ref.dtype)
    acc_scr[h] = acc_scr[h] + jax.lax.dot_general(
        p2, v2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == num_kv - 1)
    def _finalize():
        lanes = jax.lax.broadcasted_iota(jnp.int32, acc_scr[h].shape, 1)
        l2 = jnp.where(lanes < dh, l_scr[h, 0, :, :1], l_scr[h, 1, :, :1])
        l2 = jnp.maximum(l2, jnp.finfo(jnp.float32).tiny)
        o_ref[0] = (acc_scr[h] / l2).astype(o_ref.dtype)


def run_smallq(q, k, v, key_bias, tabs_q, tabs_k, heads, block_kv,
               eps=1e-6, norm_q=True, norm_k=True):
    b, sq, hd = q.shape
    skv = k.shape[1]
    d = hd // heads
    d2 = 2 * d
    hp = heads // 2
    sq_p = A._round_up(sq, _LANES)
    skv_p = A._round_up(skv, block_kv)

    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)),
                       constant_values=A._NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E

    cq, sq_t, aq, rq, bq_b = _norm_tabs(tabs_q, sq_p - sq)
    ck, sk, ak, rk, bk_b = _norm_tabs(tabs_k, skv_p - skv)
    cq, sq_t, aq = cq * _LOG2E, sq_t * _LOG2E, aq * _LOG2E
    c_shift = jnp.minimum(
        A._tabs_score_bound(cq, sq_t, aq, rq)
        * A._tabs_score_bound(ck, sk, ak, rk)
        + jnp.maximum(jnp.max(key_bias), 0.0), 120.0)
    key_bias = key_bias - c_shift

    def tab_spec(blk, batched, kv):
        def imap(b_, j_, h_):
            return (b_ if batched else 0, j_ if kv else 0, 0)
        return pl.BlockSpec((1, blk, d2), imap)

    grid = (b, skv_p // block_kv, hp)
    out = pl.pallas_call(
        functools.partial(_smallq_kernel, block_kv=block_kv, eps=eps,
                          norm_q=norm_q, norm_k=norm_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sq_p, d2), lambda b_, j, h_: (b_, 0, h_)),
            pl.BlockSpec((1, block_kv, d2), lambda b_, j, h_: (b_, j, h_)),
            pl.BlockSpec((1, block_kv, d2), lambda b_, j, h_: (b_, j, h_)),
            pl.BlockSpec((1, 1, block_kv), lambda b_, j, h_: (b_, 0, j)),
            tab_spec(sq_p, bq_b, False),
            tab_spec(sq_p, bq_b, False),
            tab_spec(sq_p, bq_b, False),
            pl.BlockSpec((d2, d2), lambda b_, j, h_: (0, 0)),
            tab_spec(block_kv, bk_b, True),
            tab_spec(block_kv, bk_b, True),
            tab_spec(block_kv, bk_b, True),
            pl.BlockSpec((d2, d2), lambda b_, j, h_: (0, 0)),
            pl.BlockSpec((d2, d2), lambda b_, j, h_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sq_p, d2), lambda b_, j, h_: (b_, 0, h_)),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hp, sq_p, d2), jnp.float32),
            pltpu.VMEM((hp, 2, sq_p, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qp, kp, vp, key_bias, cq, sq_t, aq, rq, ck, sk, ak, rk, _mu(d2))
    return out[:, :sq, :]


def main():
    b = 1
    f, hp_, wp_ = 13, 30, 45
    s_text, s_vip = 226, 480
    sq = s_text + f * hp_ * wp_  # 17,776
    heads, d = 48, 64
    hd = heads * d
    q = jax.random.normal(jax.random.PRNGKey(0), (b, sq, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, sq, hd), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, sq, hd), jnp.bfloat16)
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (d,))) + 0.5
    bs_ = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (d,))

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
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

    kv_ = jax.random.normal(jax.random.PRNGKey(5), (b, s_vip, hd), jnp.bfloat16)
    vv_ = jax.random.normal(jax.random.PRNGKey(6), (b, s_vip, hd), jnp.bfloat16)
    fl1 = 4 * b * sq * s_vip * hd

    ship1 = jax.jit(lambda q_, k2, v2, tq_, tk_: A.fused_flash_attention(
        q_, k2, v2, tq_, tk_, heads=heads))
    timed("cross1 shipped", ship1, q, kv_, vv_, tq_tv, tk_vip, flops=fl1)
    o_ref1 = ship1(q, kv_, vv_, tq_tv, tk_vip)

    for bq_ in (2048, 4096, 8192):
        fn = jax.jit(lambda q_, k2, v2, tq_, tk_, b1=bq_: run_smallkv(
            q_, k2, v2, jnp.zeros((b, s_vip), jnp.float32), tq_, tk_,
            heads, b1))
        try:
            t = timed(f"cross1 smallkv bq={bq_}", fn, q, kv_, vv_, tq_tv,
                      tk_vip, flops=fl1)
            o1 = fn(q, kv_, vv_, tq_tv, tk_vip)
            err = float(jnp.max(jnp.abs(o_ref1.astype(jnp.float32)
                                        - o1.astype(jnp.float32))))
            print(f"    max |d| vs shipped: {err:.2e}", flush=True)
        except Exception as e:
            print(f"cross1 smallkv bq={bq_}: {type(e).__name__} {str(e)[:150]}",
                  flush=True)

    qv = jax.random.normal(jax.random.PRNGKey(7), (b, s_vip, hd), jnp.bfloat16)
    kcat = jnp.concatenate([k, kv_], axis=1)
    vcat = jnp.concatenate([v, vv_], axis=1)
    fl2 = 4 * b * s_vip * (sq + s_vip) * hd
    ship2 = jax.jit(lambda qv_, kc, vc, tq_, tk_: A.fused_flash_attention(
        qv_, kc, vc, tq_, tk_, heads=heads))
    timed("cross2 shipped", ship2, qv, kcat, vcat, tq_vip, vtk, flops=fl2)
    o_ref2 = ship2(qv, kcat, vcat, tq_vip, vtk)

    for bkv_ in (1024, 2048, 4096):
        fn = jax.jit(lambda qv_, kc, vc, tq_, tk_, b2=bkv_: run_smallq(
            qv_, kc, vc, jnp.zeros((b, sq + s_vip), jnp.float32), tq_, tk_,
            heads, b2))
        try:
            t = timed(f"cross2 smallq bkv={bkv_}", fn, qv, kcat, vcat,
                      tq_vip, vtk, flops=fl2)
            o2 = fn(qv, kcat, vcat, tq_vip, vtk)
            err = float(jnp.max(jnp.abs(o_ref2.astype(jnp.float32)
                                        - o2.astype(jnp.float32))))
            print(f"    max |d| vs shipped: {err:.2e}", flush=True)
        except Exception as e:
            print(f"cross2 smallq bkv={bkv_}: {type(e).__name__} {str(e)[:150]}",
                  flush=True)


if __name__ == "__main__":
    main()

"""Pallas TPU flash attention for the joint [text‖video‖vip] sequence.

Replaces the reference's `F.scaled_dot_product_attention` under
`sdpa_kernel(SDPBackend.FLASH_ATTENTION)` (`/root/reference/longvgen/models/
attention_processor.py:2066`, `video_ipadapter/resampler.py:125`).

Design notes (TPU):
* canonical online-softmax flash attention with a 4-D grid
  (batch, head, q-block, kv-block); the kv axis is the innermost ("arbitrary")
  grid dimension so Pallas double-buffers K/V block DMAs against the MXU matmuls,
* running max / denominator / accumulator live in VMEM scratch and persist across
  the kv iterations of one q block; the output is normalised and written on the
  last kv step,
* f32 softmax and accumulation (`preferred_element_type`) with bf16 inputs feeding
  the MXU,
* non-multiple sequence lengths are zero-padded by the wrapper and masked via an
  additive key-bias, which doubles as the T2To padded-chunk attention mask,
* RoPE is applied *before* the kernel (it differs per stream), so one kernel serves
  all three attention patterns of the VIP processor: base joint self-attn,
  text_video→vip cross-attn, and vip→[text_video‖vip] attn.

On non-TPU backends the wrapper dispatches to a plain XLA reference implementation
(identical math) so the full model runs under the CPU test mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9
_LANES = 128


_LOG2E = 1.4426950408889634


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr, *,
    hblk: int, has_bias: bool
):
    # q_ref: [1, hblk, Bq, D] (pre-scaled by scale*log2e outside);
    # k_ref: [1, hblk, D, Bk] (pre-transposed — measured faster than [Bk, D]);
    # v_ref: [1, hblk, Bk, D]; bias_ref: [1, 1, Bk] (pre-scaled by log2e).
    # Scratch rows interleave the hblk heads ([h + hblk*row] striding) so each
    # head's slice is a strided VMEM view. softmax runs in the exp2 domain.
    #
    # hblk=2 processes two heads per grid step: their chains are independent, so
    # the scheduler overlaps head B's MXU matmuls with head A's VPU softmax
    # (~10% faster than hblk=1 at the 18k joint shape).
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    bias = bias_ref[0, 0][None, :] if has_bias else None
    scores = []
    for hh in range(hblk):  # issue all MXU score matmuls first (ILP)
        s = jax.lax.dot_general(
            q_ref[0, hh], k_ref[0, hh], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Bq, Bk], log2-domain (q pre-scaled)
        scores.append(s + bias if has_bias else s)

    for hh, s in enumerate(scores):
        m_prev = m_scr[hh::hblk, :1]  # [Bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[hh::hblk, :1] = alpha * l_scr[hh::hblk, :1] + jnp.sum(
            p, axis=-1, keepdims=True)
        # p in bf16 for the MXU (f32xf32 runs at half rate); accumulation f32
        acc_scr[hh::hblk] = alpha * acc_scr[hh::hblk] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, hh],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        m_scr[hh::hblk, :1] = m_new  # only lane 0 is ever read back

    @pl.when(j == num_kv - 1)
    def _finalize():
        for hh in range(hblk):
            o_ref[0, hh] = (acc_scr[hh::hblk] / l_scr[hh::hblk, :1]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv", "has_bias"))
def _flash_attention_tpu(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_bias: jnp.ndarray,
    scale: float,
    block_q: int,
    block_kv: int,
    has_bias: bool = True,
) -> jnp.ndarray:
    b, h, sq, d = q.shape
    skv = k.shape[2]
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_kv)
    has_bias = has_bias or skv_p != skv  # padding mask rides the bias path
    hblk = 2 if h % 2 == 0 else 1

    # fold scale and the exp2-domain conversion into q / bias (saves a full
    # VPU pass over every [Bq, Bk] score tile)
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    kt = k.transpose(0, 1, 3, 2)  # [B, H, D, Skv]
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)), constant_values=_NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E  # [B, 1, Skv]

    grid = (b, h // hblk, sq_p // block_q, skv_p // block_kv)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, hblk=hblk, has_bias=has_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hblk, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, hblk, d, block_kv), lambda b_, h_, i, j: (b_, h_, 0, j)),
            pl.BlockSpec((1, hblk, block_kv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, hblk, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hblk * block_q, _LANES), jnp.float32),
            pltpu.VMEM((hblk * block_q, _LANES), jnp.float32),
            pltpu.VMEM((hblk * block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(q, kt, v, key_bias)
    return out[:, :, :sq, :]


def _blocked_attention_bwd(q, k, v, key_bias, out, g, scale):
    """Flash-style attention backward in pure XLA: recompute p per q-block
    inside a `lax.scan` so no [Sq, Skv] tensor for the whole sequence is ever
    materialised. Float32 math; block size adapts to a ~500 MB logits budget.
    Returns (dq, dk, dv, dbias)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    gf = g.astype(jnp.float32)
    dsum = jnp.sum(gf * out.astype(jnp.float32), axis=-1)  # [B,H,Sq]

    per_row = max(1, b * h * skv * 4)
    bq = int(5e8 // per_row)
    bq = max(64, min(512, (bq // 64) * 64 or 64))
    sq_p = _round_up(sq, bq)
    pad = sq_p - sq
    qp = jnp.pad(qf, ((0, 0), (0, 0), (0, pad), (0, 0)))
    gp = jnp.pad(gf, ((0, 0), (0, 0), (0, pad), (0, 0)))
    dp_pad = jnp.pad(dsum, ((0, 0), (0, 0), (0, pad)))
    biasb = key_bias.astype(jnp.float32)[:, None, None, :]  # [B,1,1,Skv]

    def step(carry, i):
        dk_acc, dv_acc, dbias_acc = carry
        qb = jax.lax.dynamic_slice_in_dim(qp, i * bq, bq, 2)
        gb = jax.lax.dynamic_slice_in_dim(gp, i * bq, bq, 2)
        db = jax.lax.dynamic_slice_in_dim(dp_pad, i * bq, bq, 2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qb, kf) * scale + biasb
        p = jax.nn.softmax(s, axis=-1)
        # padded q rows have g == 0, so every term below vanishes for them
        dv_acc = dv_acc + jnp.einsum("bhqk,bhqd->bhkd", p, gb)
        dpv = jnp.einsum("bhqd,bhkd->bhqk", gb, vf)
        ds = p * (dpv - db[..., None])
        dq_b = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
        dk_acc = dk_acc + jnp.einsum("bhqk,bhqd->bhkd", ds, qb) * scale
        dbias_acc = dbias_acc + jnp.sum(ds, axis=(1, 2))
        return (dk_acc, dv_acc, dbias_acc), dq_b

    init = (jnp.zeros_like(kf), jnp.zeros_like(vf),
            jnp.zeros((b, skv), jnp.float32))
    (dk, dv, dbias), dqs = jax.lax.scan(step, init, jnp.arange(sq_p // bq))
    dq = jnp.moveaxis(dqs, 0, 2).reshape(b, h, sq_p, d)[:, :, :sq]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(key_bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _flash_attention_tpu_diff(scale, block_q, block_kv, has_bias, q, k, v, key_bias):
    """`_flash_attention_tpu` with gradients: `pallas_call` has no JVP rule, so
    differentiating the raw kernel crashes (hit by the To2V/T2To train steps
    whenever this kernel serves the bias path or non-lib head dims). Forward is
    the Pallas kernel; backward is `_blocked_attention_bwd`."""
    return _flash_attention_tpu(q, k, v, key_bias, scale, block_q, block_kv,
                                has_bias=has_bias)


def _flash_diff_fwd(scale, block_q, block_kv, has_bias, q, k, v, key_bias):
    out = _flash_attention_tpu(q, k, v, key_bias, scale, block_q, block_kv,
                               has_bias=has_bias)
    return out, (q, k, v, key_bias, out)


def _flash_diff_bwd(scale, block_q, block_kv, has_bias, res, g):
    q, k, v, key_bias, out = res
    return _blocked_attention_bwd(q, k, v, key_bias, out, g, scale)


_flash_attention_tpu_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def _xla_attention(q, k, v, key_bias, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * scale + key_bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
    tp_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Bidirectional attention, [B, H, Sq, D] x [B, H, Skv, D] -> [B, H, Sq, D].

    ``key_bias``: optional additive [B, Skv] bias on keys (0 / -1e9), used for the
    T2To padded-chunk mask. ``scale`` defaults to 1/sqrt(D) (SDPA default).

    ``tp_axis``: mesh axis name for tensor parallelism. Attention is independent
    per head, but the Pallas custom call does not auto-partition under jit
    sharding propagation — so when TP is on, the op shard_maps *itself* over the
    head dimension (each shard runs the unchanged kernel on its local heads; no
    collectives inside). Requires an ambient mesh (``jax.set_mesh`` /
    ``jax.sharding.use_abstract_mesh``) carrying ``tp_axis``, and H divisible by
    its size. With column-parallel q/k/v projections (sharding/tp.py) the inputs
    are already head-sharded, so entering the shard_map moves no data.
    """
    b, h, sq, d = q.shape
    has_bias = key_bias is not None
    if key_bias is None:
        key_bias = jnp.zeros((b, k.shape[2]), dtype=jnp.float32)
    else:
        key_bias = key_bias.astype(jnp.float32)
    if scale is None:
        scale = d**-0.5

    if tp_axis is not None:
        from jax.sharding import PartitionSpec as P

        hs = P(None, tp_axis, None, None)
        fn = jax.shard_map(
            lambda q_, k_, v_, bias_: _dispatch(
                q_, k_, v_, bias_, scale, block_q, block_kv, has_bias),
            in_specs=(hs, hs, hs, P(None, None)),
            out_specs=hs,
        )
        return fn(q, k, v, key_bias)
    return _dispatch(q, k, v, key_bias, scale, block_q, block_kv, has_bias)


def _dispatch(q, k, v, key_bias, scale, block_q, block_kv, has_bias):
    sq = q.shape[2]
    d = q.shape[3]
    if jax.default_backend() == "tpu":
        import os

        if (not has_bias and os.environ.get("TOKENSGEN_LIB_FLASH", "0") == "1"
                and sq >= 512 and k.shape[2] >= 1024 and d in (64, 128)):
            # jax's in-tree TPU flash kernel, kept behind TOKENSGEN_LIB_FLASH=1
            # for comparison. Our kernel (2-heads-per-step, pre-transposed K,
            # folded scale) measures ~59-63 ms vs lib's ~72 ms at the 18k joint
            # shape (round 2), so ours is the default on every path.
            try:
                return _lib_flash(q, k, v, scale)
            except Exception:
                pass
        block_q = min(block_q, _round_up(sq, 128))
        block_kv = min(block_kv, _round_up(k.shape[2], 128))
        return _flash_attention_tpu_diff(scale, block_q, block_kv, has_bias,
                                         q, k, v, key_bias)
    return _xla_attention(q, k, v, key_bias, scale)


def _lib_flash(q, k, v, scale):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention as _fa,
    )

    b = q.shape[0]
    sq, skv = q.shape[2], k.shape[2]
    sq_p = _round_up(sq, 512)
    skv_p = _round_up(skv, 1024)
    seg = None
    if sq_p != sq or skv_p != skv:
        # mask padding via segment ids: real tokens segment 1, padding segment 0
        # (padded q rows are fully masked -> garbage, sliced off below)
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
        qs = jnp.broadcast_to((jnp.arange(sq_p) < sq).astype(jnp.int32), (b, sq_p))
        ks = jnp.broadcast_to((jnp.arange(skv_p) < skv).astype(jnp.int32), (b, skv_p))
        seg = SegmentIds(q=qs, kv=ks)
    bs = BlockSizes(block_q=512, block_k_major=1024, block_k=1024, block_b=1)
    out = _fa(q, k, v, segment_ids=seg, causal=False, sm_scale=scale,
              block_sizes=bs)
    return out[:, :, :sq, :]

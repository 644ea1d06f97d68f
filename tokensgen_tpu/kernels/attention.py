"""Pallas TPU flash attention for the joint [text‖video‖vip] sequence.

Replaces the reference's `F.scaled_dot_product_attention` under
`sdpa_kernel(SDPBackend.FLASH_ATTENTION)` (`/root/reference/longvgen/models/
attention_processor.py:2066`, `video_ipadapter/resampler.py:125`).

Design notes (TPU) — see PERF.md for every measured number:
* the production path is `fused_flash_attention` on merged [B, S, H*D]
  operands: head PAIRS are packed side-by-side in a 128-wide feature slot
  (a d=64 minor dim is lane-padded 2x in HBM; the packed layout is exact-fit)
  and every matmul is full-width via block-diagonal operands,
* the qk LayerNorm + interleaved RoPE prologue is fused into the kernel as
  per-position tables plus one constant signed-permutation matmul
  (`make_prologue`: rope(LN(x)) = LN0∘cosg + (LN0@Rg)∘sin + add — exact),
  computed once per q block / once per kv block (cached in persistent VMEM
  scratch across the q sweep),
* softmax is max-free when both sides normalize: LN0 rows have exactly
  sqrt(d) L2 norm, so |scores| <= C is provable from the tables
  (`_tabs_score_bound`) and C folds into the additive bias — exp2 with no
  online max tracking and no accumulator rescale, still the exact softmax,
* training backward is a packed Pallas kernel too (`_packed_bwd_kernel`):
  logit tiles never touch HBM; the forward saves a per-row logsumexp,
* f32 softmax/accumulation (`preferred_element_type`) with bf16 MXU operands,
* non-multiple lengths are zero-padded by the wrapper and masked via the
  additive key-bias, which doubles as the T2To padded-chunk attention mask,
* one kernel serves all VIP processor patterns (base joint self-attn,
  text_video→vip cross-attn, vip→[text_video‖vip]) — the per-stream rope
  differences are just different table segments.

`flash_attention` (4-D [B,H,S,D], prologue outside) remains for callers
without a qk-norm/rope prologue (resampler, tests). On non-TPU backends both
entry points dispatch to a plain XLA reference implementation (identical
math) so the full model runs under the CPU test mesh; interpreter-mode tests
run the exact kernel bodies in CI.
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


# ---------------------------------------------------------------------------
# Fused qk-norm + RoPE prologue
#
# The DiT applies, per attention and per stream: LayerNorm(d=64, f32 stats,
# affine) on q/k followed by interleaved rotary embedding — ~25 ms/layer of
# HBM-bound elementwise at the 18k joint shape when done in XLA. Both fold
# algebraically into the kernel:
#
#     rope(LN(x)) = LN0(x) ∘ cosg + (LN0(x) @ Rg) ∘ sin + add
#
# where LN0 is the *unscaled* normalize, cosg = cos∘g, add = b∘cos + (b@R)∘sin
# are per-position tables, R is the constant signed pair-swap permutation
# ((x0,x1) -> (-x1,x0)) and Rg = diag(g)@R — so the rotation is ONE tiny
# [blk,64]x[64,64] f32 matmul (exact: R entries are 0/±1) instead of lane
# shuffles. The kernel computes q' once per q block (at j==0) and K' once per
# kv block (at i==0, cached in a VMEM scratch that persists across all later
# q blocks of the same head pair), overlapped with the MXU score matmuls.
# Identity tables (cos=1, sin=0) express "rope on the video segment only":
# text positions simply get identity rows. The softmax scale (and the exp2
# conversion) is pre-multiplied into the q-side tables.
# ---------------------------------------------------------------------------


def rotation_matrix(d: int) -> jnp.ndarray:
    """[D, D] signed permutation R with (x@R)[2i] = -x[2i+1], (x@R)[2i+1] = x[2i],
    i.e. the interleaved rotate-half of `apply_rotary_emb`."""
    import numpy as np

    r = np.zeros((d, d), np.float32)
    for i in range(0, d, 2):
        r[i + 1, i] = -1.0
        r[i, i + 1] = 1.0
    return jnp.asarray(r)


def make_prologue(
    d: int,
    segments,
    ln_scale: Optional[jnp.ndarray] = None,
    ln_bias: Optional[jnp.ndarray] = None,
    fold: float = 1.0,
):
    """Build (cosg, sin, add, Rg) tables for the fused qk-norm+rope prologue.

    ``segments``: list of ``(rope_or_None, length)`` in sequence order; a None
    rope contributes identity rows (cos=1, sin=0 — "no rotation" positions,
    e.g. the text segment of the joint sequence). Rope tables may be [S, D] or
    batched [B, S, D] (FIFO's per-sample traced grids); mixing requires equal B.
    ``ln_scale``/``ln_bias``: optional LayerNorm affine params [D].
    ``fold``: scalar premultiplied into all tables (softmax scale fold).
    """
    f32 = jnp.float32
    batch = None
    for rope, _ in segments:
        if rope is not None and rope[0].ndim == 3:
            batch = rope[0].shape[0]
    cos_parts, sin_parts = [], []
    for rope, length in segments:
        if length == 0:
            continue
        if rope is None:
            shape = (length, d) if batch is None else (batch, length, d)
            cos_parts.append(jnp.ones(shape, f32))
            sin_parts.append(jnp.zeros(shape, f32))
        else:
            cos_r, sin_r = rope
            assert cos_r.shape[-2] == length, (cos_r.shape, length)
            cos_r, sin_r = cos_r.astype(f32), sin_r.astype(f32)
            if batch is not None and cos_r.ndim == 2:
                cos_r = jnp.broadcast_to(cos_r[None], (batch,) + cos_r.shape)
                sin_r = jnp.broadcast_to(sin_r[None], (batch,) + sin_r.shape)
            cos_parts.append(cos_r)
            sin_parts.append(sin_r)
    cos = jnp.concatenate(cos_parts, axis=-2) if len(cos_parts) > 1 else cos_parts[0]
    sin = jnp.concatenate(sin_parts, axis=-2) if len(sin_parts) > 1 else sin_parts[0]
    r = rotation_matrix(d)
    if ln_scale is not None:
        g = ln_scale.astype(f32)
        cosg = cos * g
        rg = g[:, None] * r  # diag(g) @ R
    else:
        cosg = cos
        rg = r
    if ln_bias is not None:
        b_ = ln_bias.astype(f32)
        add = b_ * cos + (b_ @ r) * sin
    else:
        add = jnp.zeros_like(cos)
    if fold != 1.0:
        cosg, sin, add = cosg * fold, sin * fold, add * fold
    return cosg, sin, add, rg


def prologue_identity(seq_len: int, d: int, fold: float = 1.0):
    """Identity prologue (no norm, no rope): y = x * fold."""
    return make_prologue(d, [(None, seq_len)], fold=fold)


def slice_tabs(tabs, start: int, stop: int):
    """Row-slice prologue tables (for attention over a sub-sequence)."""
    cosg, sin, add, rg = tabs
    return (cosg[..., start:stop, :], sin[..., start:stop, :],
            add[..., start:stop, :], rg)


def concat_tabs(*tabs_list):
    """Concatenate prologue tables along the sequence axis (same Rg)."""
    cosg = jnp.concatenate([t[0] for t in tabs_list], axis=-2)
    sin = jnp.concatenate([t[1] for t in tabs_list], axis=-2)
    add = jnp.concatenate([t[2] for t in tabs_list], axis=-2)
    return cosg, sin, add, tabs_list[0][3]


def _apply_prologue_xla(x, tabs, eps: float, normalize: bool):
    """XLA reference of the in-kernel prologue: x [..., S, D], tabs [(B,)S, D]."""
    cosg, sin, add, rg = tabs
    x32 = x.astype(jnp.float32)
    if normalize:
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        dlt = x32 - mu
        var = jnp.mean(dlt * dlt, axis=-1, keepdims=True)
        ln0 = dlt * jax.lax.rsqrt(var + eps)
    else:
        ln0 = x32
    if cosg.ndim == 3:  # batched tables [B, S, D] vs x [B, H, S, D]
        cosg, sin, add = cosg[:, None], sin[:, None], add[:, None]
    y = ln0 * cosg + (ln0 @ rg) * sin + add
    return y.astype(x.dtype)


def _ln_rope_block(x_ref_slice, cosg, sin, add, rg, eps: float, normalize: bool,
                   out_dtype):
    """In-kernel prologue on one [blk, D] block."""
    x32 = x_ref_slice.astype(jnp.float32)
    if normalize:
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        dlt = x32 - mu
        var = jnp.mean(dlt * dlt, axis=-1, keepdims=True)
        ln0 = dlt * jax.lax.rsqrt(var + eps)
    else:
        ln0 = x32
    rot = jax.lax.dot_general(
        ln0, rg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return (ln0 * cosg + rot * sin + add).astype(out_dtype)


def _flash_fused_kernel(
    q_ref, k_ref, v_ref, bias_ref,
    cq_ref, sq_ref, aq_ref, rq_ref,
    ck_ref, sk_ref, ak_ref, rk_ref,
    o_ref, m_scr, l_scr, acc_scr, qn_scr, kn_scr, *,
    hblk: int, has_bias: bool, block_kv: int, eps: float, norm_q: bool,
    norm_k: bool,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        for hh in range(hblk):
            qn_scr[hh] = _ln_rope_block(
                q_ref[0, hh], cq_ref[0], sq_ref[0], aq_ref[0], rq_ref[:],
                eps, norm_q, qn_scr.dtype)

    @pl.when(i == 0)
    def _prep_k():
        for hh in range(hblk):
            kn_scr[hh, pl.ds(j * block_kv, block_kv), :] = _ln_rope_block(
                k_ref[0, hh], ck_ref[0], sk_ref[0], ak_ref[0], rk_ref[:],
                eps, norm_k, kn_scr.dtype)

    bias = bias_ref[0, 0][None, :] if has_bias else None
    scores = []
    for hh in range(hblk):
        s = jax.lax.dot_general(
            qn_scr[hh], kn_scr[hh, pl.ds(j * block_kv, block_kv), :],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [Bq, Bk], log2-domain (scale*log2e folded into the q tables)
        scores.append(s + bias if has_bias else s)

    for hh, s in enumerate(scores):
        m_prev = m_scr[hh, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[hh, :, :1] = alpha * l_scr[hh, :, :1] + jnp.sum(p, axis=-1,
                                                              keepdims=True)
        acc_scr[hh] = alpha * acc_scr[hh] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, hh],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        m_scr[hh, :, :1] = m_new

    @pl.when(j == num_kv - 1)
    def _finalize():
        for hh in range(hblk):
            o_ref[0, hh] = (acc_scr[hh] / l_scr[hh, :, :1]).astype(o_ref.dtype)


def _pad_tabs(tabs, pad, batched, pad_cos=0.0):
    cosg, sin, add, rg = tabs
    ax = 1 if batched else 0
    width = [(0, 0)] * cosg.ndim
    width[ax] = (0, pad)
    return (jnp.pad(cosg, width, constant_values=pad_cos),
            jnp.pad(sin, width), jnp.pad(add, width), rg)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_kv", "has_bias", "eps", "norm_q",
                     "norm_k", "interpret"))
def _flash_fused_tpu(
    q, k, v, key_bias, tabs_q, tabs_k,
    block_q: int, block_kv: int, has_bias: bool, eps: float,
    norm_q: bool, norm_k: bool, interpret: bool = False,
):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_kv)
    has_bias = has_bias or skv_p != skv
    hblk = 2 if h % 2 == 0 else 1

    q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)),
                       constant_values=_NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E

    # tables: normalize to [Bt, S, D] (Bt==1 shared across the batch)
    def norm_tabs(tabs, pad):
        cosg, sin, add, rg = tabs
        batched = cosg.ndim == 3
        tabs = _pad_tabs((cosg, sin, add, rg), pad, batched)
        cosg, sin, add, rg = tabs
        if not batched:
            cosg, sin, add = cosg[None], sin[None], add[None]
        return cosg, sin, add, rg, (cosg.shape[0] != 1)

    cq, sq_t, aq, rq, bq_batched = norm_tabs(tabs_q, sq_p - sq)
    ck, sk, ak, rk, bk_batched = norm_tabs(tabs_k, skv_p - skv)
    # tables fold the softmax scale; the exp2-domain conversion is kernel-internal
    cq, sq_t, aq = cq * _LOG2E, sq_t * _LOG2E, aq * _LOG2E

    def tab_spec(blk, batched, kv: bool):
        def imap(b_, h_, i_, j_):
            pos = j_ if kv else i_
            return (b_ if batched else 0, pos, 0)
        return pl.BlockSpec((1, blk, d), imap)

    grid = (b, h // hblk, sq_p // block_q, skv_p // block_kv)
    out = pl.pallas_call(
        functools.partial(
            _flash_fused_kernel, hblk=hblk, has_bias=has_bias,
            block_kv=block_kv, eps=eps, norm_q=norm_q, norm_k=norm_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hblk, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, hblk, block_kv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, hblk, block_kv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j)),
            tab_spec(block_q, bq_batched, False),
            tab_spec(block_q, bq_batched, False),
            tab_spec(block_q, bq_batched, False),
            pl.BlockSpec((d, d), lambda b_, h_, i, j: (0, 0)),
            tab_spec(block_kv, bk_batched, True),
            tab_spec(block_kv, bk_batched, True),
            tab_spec(block_kv, bk_batched, True),
            pl.BlockSpec((d, d), lambda b_, h_, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, hblk, block_q, d), lambda b_, h_, i, j: (b_, h_, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hblk, block_q, _LANES), jnp.float32),
            pltpu.VMEM((hblk, block_q, _LANES), jnp.float32),
            pltpu.VMEM((hblk, block_q, d), jnp.float32),
            pltpu.VMEM((hblk, block_q, d), q.dtype),
            pltpu.VMEM((hblk, skv_p, d), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
            # the default scoped-vmem budget is 16 MB; the persistent normed-K
            # scratch [hblk, Skv, D] plus double-buffered blocks needs more
            # (v5e has 128 MB physical VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(q, k, v, key_bias, cq, sq_t, aq, rq, ck, sk, ak, rk)
    return out[:, :, :sq, :]


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
    materialised. Matmul operands stay bf16 with f32 accumulation
    (`preferred_element_type`) — all-f32 einsums ran at f32 MXU rate, 1865 ms
    vs 62 ms forward at the 18k joint shape; softmax/ds arithmetic is f32.
    Block size adapts to a ~500 MB logits budget. Returns (dq, dk, dv, dbias)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    f32 = jnp.float32
    mm = functools.partial(jnp.einsum, preferred_element_type=f32)
    dsum = jnp.sum(g.astype(f32) * out.astype(f32), axis=-1)  # [B,H,Sq]

    per_row = max(1, b * h * skv * 4)
    bq = int(5e8 // per_row)
    bq = max(64, min(512, (bq // 64) * 64 or 64))
    sq_p = _round_up(sq, bq)
    pad = sq_p - sq
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    gp = jnp.pad(g.astype(q.dtype), ((0, 0), (0, 0), (0, pad), (0, 0)))
    dp_pad = jnp.pad(dsum, ((0, 0), (0, 0), (0, pad)))
    biasb = key_bias.astype(f32)[:, None, None, :]  # [B,1,1,Skv]

    def step(carry, i):
        dk_acc, dv_acc, dbias_acc = carry
        qb = jax.lax.dynamic_slice_in_dim(qp, i * bq, bq, 2)
        gb = jax.lax.dynamic_slice_in_dim(gp, i * bq, bq, 2)
        db = jax.lax.dynamic_slice_in_dim(dp_pad, i * bq, bq, 2)
        s = mm("bhqd,bhkd->bhqk", qb, k) * scale + biasb
        p = jax.nn.softmax(s, axis=-1)
        pb = p.astype(q.dtype)
        # padded q rows have g == 0, so every term below vanishes for them
        dv_acc = dv_acc + mm("bhqk,bhqd->bhkd", pb, gb)
        dpv = mm("bhqd,bhkd->bhqk", gb, v)
        ds = p * (dpv - db[..., None])
        dsb = ds.astype(q.dtype)
        dq_b = mm("bhqk,bhkd->bhqd", dsb, k) * scale
        dk_acc = dk_acc + mm("bhqk,bhqd->bhkd", dsb, qb) * scale
        dbias_acc = dbias_acc + jnp.sum(ds, axis=(1, 2))
        return (dk_acc, dv_acc, dbias_acc), dq_b

    init = (jnp.zeros(k.shape, f32), jnp.zeros(v.shape, f32),
            jnp.zeros((b, skv), f32))
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


# ---------------------------------------------------------------------------
# Packed head-pair kernel (d=64 on a 128-lane MXU)
#
# A [B, H, S, 64] array is tiled (8, 128) on its last two dims, so the minor
# d=64 is lane-padded to 128: 2x the HBM *and* 2x the DMA traffic of the
# logical data (this padding alone kept the CFG-batched B=2 forward of the
# 7.17B model from fitting a 16 GB chip). The packed kernel stores head pairs
# side-by-side in the feature dim — [B, H/2, S, 128], no padding — and keeps
# every matmul full-width via block-diagonal operands:
#
#   * scores: q2 [Bq,128] @ KT [128, 2*Bk] where KT = blockdiag(kA^T, kB^T)
#     -> [sA | sB] side by side (the zero quadrants make the extra MACs
#     redundant-but-free: a K=64 matmul wastes half the MXU anyway),
#   * p@v:    [pA | pB] [Bq, 2*Bk] @ blockdiag(vA, vB) [2*Bk, 128] -> [oA|oB],
#   * prologue LN stats per 64-lane half via one matmul with
#     Mu = blockdiag(J/64, J/64) (no lane slicing), rotation via
#     blockdiag(Rg, Rg).
#
# KT and V2 are built once per head pair (at i==0) into persistent VMEM
# scratch and reused by every later q block. Per-half softmax state uses
# register-aligned [*, :Bk] / [*, Bk:] slices only.
# ---------------------------------------------------------------------------


_LN2 = 0.6931471805599453


def _tabs_score_bound(cosg, sin, add, rg):
    """Upper bound on ||prologue(x)_row||_2 over all positions, valid when the
    prologue normalizes (then ||LN0_row||_2 = sqrt(d) exactly):

        prologue(x)_row = LN0 @ M_pos + add_pos,
        M_pos = diag(cosg_pos) + Rg @ diag(sin_pos)
        ||M||_op <= sqrt(||M||_1 * ||M||_inf)

    With bounds for both sides, |scores| <= C_q * C_k (Cauchy-Schwarz) — a
    *static-shape, traced-value* bound that lets the kernel run softmax as
    exp2(s - C) with no online max tracking (exact softmax: the shift cancels).
    """
    d = rg.shape[0]
    acg, asn, aad, arg = (jnp.abs(t.astype(jnp.float32))
                          for t in (cosg, sin, add, rg))
    colsum = jnp.sum(arg, axis=0)  # [D]
    c1 = jnp.max(acg + asn * colsum, axis=-1)  # ||M||_1 per position
    cinf = jnp.max(acg + asn @ arg.T, axis=-1)  # ||M||_inf per position
    row = jnp.sqrt(d * 1.0) * jnp.sqrt(c1 * cinf) + jnp.sqrt(
        jnp.sum(aad * aad, axis=-1))
    return jnp.max(row)


def _flash_packed_kernel(
    q_ref, k_ref, v_ref, bias_ref,
    cq_ref, sq_ref, aq_ref, rq_ref,
    ck_ref, sk_ref, ak_ref, rk_ref, mu_ref,
    *refs,
    has_bias: bool, block_kv: int, eps: float, norm_q: bool, norm_k: bool,
    with_lse: bool = False, no_max: bool = False, int8_scores: bool = False,
):
    qs_scr = ks_scr = None
    if int8_scores:
        refs, (qs_scr, ks_scr) = refs[:-2], refs[-2:]
    if with_lse:
        o_ref, lse_ref, m_scr, l_scr, acc_scr, qn_scr, kt_scr, v2_scr = refs
    else:
        o_ref, m_scr, l_scr, acc_scr, qn_scr, kt_scr, v2_scr = refs
        lse_ref = None
    i = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3)
    d2 = q_ref.shape[-1]  # 128 = two packed heads
    dh = d2 // 2

    def prologue(x, cos_t, sin_t, add_t, rg, normalize):
        x32 = x.astype(jnp.float32)
        if normalize:
            mu = jax.lax.dot_general(
                x32, mu_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dlt = x32 - mu
            var = jax.lax.dot_general(
                dlt * dlt, mu_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ln0 = dlt * jax.lax.rsqrt(var + eps)
        else:
            ln0 = x32
        rot = jax.lax.dot_general(
            ln0, rg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return ln0 * cos_t + rot * sin_t + add_t  # f32

    @pl.when(j == 0)
    def _init():
        if not no_max:
            m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        qn32 = prologue(q_ref[0], cq_ref[0], sq_ref[0], aq_ref[0],
                        rq_ref[:], norm_q)
        if int8_scores:
            # per-row q scale (amortized: computed once per q block, reused
            # across all kv steps); per-step dequant is a row-broadcast
            # multiply folded into the score pass alongside the column one
            qs = jnp.maximum(jnp.max(jnp.abs(qn32), axis=1, keepdims=True),
                             1e-30)
            qn_scr[:] = jnp.clip(jnp.round(qn32 * (127.0 / qs)),
                                 -127.0, 127.0).astype(jnp.int8)
            qs_scr[:, :1] = qs * (1.0 / 127.0)
        else:
            qn_scr[:] = qn32.astype(qn_scr.dtype)

    @pl.when(i == 0)
    def _prep_kv():
        kn32 = prologue(k_ref[0], ck_ref[0], sk_ref[0], ak_ref[0],
                        rk_ref[:], norm_k)  # [Bk, 128] f32
        if int8_scores:
            knt32 = kn32.T  # [128, Bk]
            # per kv-position (column) scale; both packed halves of a row
            # were quantized jointly so both column groups share it
            ksc = jnp.maximum(
                jnp.max(jnp.abs(knt32), axis=0, keepdims=True), 1e-30)
            knt = jnp.clip(jnp.round(knt32 * (127.0 / ksc)), -127.0, 127.0)
            ks_scr[0:1, pl.ds(2 * j * block_kv, block_kv)] = ksc * (1.0 / 127.0)
            ks_scr[0:1, pl.ds(2 * j * block_kv + block_kv, block_kv)] = (
                ksc * (1.0 / 127.0))
        else:
            knt = kn32.astype(kt_scr.dtype).T  # [128, Bk]
        rows = jax.lax.broadcasted_iota(jnp.int32, knt.shape, 0)
        kt_scr[:, pl.ds(2 * j * block_kv, block_kv)] = jnp.where(
            rows < dh, knt, 0).astype(kt_scr.dtype)
        kt_scr[:, pl.ds(2 * j * block_kv + block_kv, block_kv)] = jnp.where(
            rows >= dh, knt, 0).astype(kt_scr.dtype)
        v2 = v_ref[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, v2.shape, 1)
        v2_scr[pl.ds(2 * j * block_kv, block_kv), :] = jnp.where(
            lanes < dh, v2, 0)
        v2_scr[pl.ds(2 * j * block_kv + block_kv, block_kv), :] = jnp.where(
            lanes >= dh, v2, 0)

    s2 = jax.lax.dot_general(
        qn_scr[:], kt_scr[:, pl.ds(2 * j * block_kv, 2 * block_kv)],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if int8_scores else jnp.float32,
    )  # [Bq, 2*Bk] = [sA | sB], log2 domain
    if int8_scores:
        cf = ks_scr[0:1, pl.ds(2 * j * block_kv, 2 * block_kv)]
        s2 = s2.astype(jnp.float32) * qs_scr[:, :1] * cf
    bias = bias_ref[0, 0][None, :] if has_bias else None
    lanes = jax.lax.broadcasted_iota(jnp.int32, acc_scr.shape, 1)
    ps = []
    if no_max:
        # qk-norm bounds the scores (see _tabs_score_bound): the wrapper folds
        # the bound C into the bias, so s <= 0 here and softmax needs no
        # online max — no max-reduce, no accumulator rescale. The min() is a
        # no-op when the bound holds (it fuses with the add) and caps p at 1
        # if a pathological bound ever exceeds the wrapper's clip — overflow
        # becomes a mild softmax distortion instead of inf/NaN.
        for hh in range(2):
            s = jnp.minimum(s2[:, hh * block_kv:(hh + 1) * block_kv] + bias, 0.0)
            p = jnp.exp2(s)
            l_scr[hh, :, :1] = l_scr[hh, :, :1] + jnp.sum(p, axis=-1,
                                                          keepdims=True)
            ps.append(p)
        p2 = jnp.concatenate(ps, axis=1).astype(v_ref.dtype)
        acc_scr[:] = acc_scr[:] + jax.lax.dot_general(
            p2, v2_scr[pl.ds(2 * j * block_kv, 2 * block_kv), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    else:
        for hh in range(2):
            s = s2[:, hh * block_kv:(hh + 1) * block_kv]
            if has_bias:
                s = s + bias
            m_prev = m_scr[hh, :, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
            l_scr[hh, :, :1] = alpha * l_scr[hh, :, :1] + jnp.sum(
                p, axis=-1, keepdims=True)
            m_scr[hh, :, :1] = m_new
            ps.append((p, alpha))

        alpha2 = jnp.where(lanes < dh, ps[0][1], ps[1][1])
        p2 = jnp.concatenate([ps[0][0], ps[1][0]], axis=1).astype(v_ref.dtype)
        acc_scr[:] = alpha2 * acc_scr[:] + jax.lax.dot_general(
            p2, v2_scr[pl.ds(2 * j * block_kv, 2 * block_kv), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_kv - 1)
    def _finalize():
        l2 = jnp.where(lanes < dh, l_scr[0, :, :1], l_scr[1, :, :1])
        if no_max:
            # if every shifted score in a row underflows exp2 (all-negative
            # score row under a near-clip bound C), l sums to 0 — floor the
            # denominator so the row degrades to 0 output instead of NaN
            l2 = jnp.maximum(l2, jnp.finfo(jnp.float32).tiny)
        o_ref[0] = (acc_scr[:] / l2).astype(o_ref.dtype)
        if with_lse:
            # natural-domain logsumexp per row: lane 0 = head A, lane 1 = B
            # (the backward kernel re-lays these out in XLA). In no_max mode
            # the shift C is re-added by the wrapper.
            if no_max:
                tiny = jnp.finfo(jnp.float32).tiny
                lse_a = jnp.log(jnp.maximum(l_scr[0, :, :1], tiny))
                lse_b = jnp.log(jnp.maximum(l_scr[1, :, :1], tiny))
            else:
                lse_a = m_scr[0, :, :1] * _LN2 + jnp.log(l_scr[0, :, :1])
                lse_b = m_scr[1, :, :1] * _LN2 + jnp.log(l_scr[1, :, :1])
            lane1 = jax.lax.broadcasted_iota(jnp.int32, lse_ref[0, 0].shape, 1)
            lse_ref[0, 0] = jnp.where(lane1 == 0, lse_a,
                                      jnp.where(lane1 == 1, lse_b, 0.0))


def _pack_tabs(tabs):
    """Duplicate [.., S, D] prologue tables to packed [.., S, 2D]; blockdiag Rg."""
    cosg, sin, add, rg = tabs
    d = rg.shape[0]
    z = jnp.zeros((d, d), rg.dtype)
    rg2 = jnp.block([[rg, z], [z, rg]])
    return (jnp.concatenate([cosg, cosg], axis=-1),
            jnp.concatenate([sin, sin], axis=-1),
            jnp.concatenate([add, add], axis=-1), rg2)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "block_q", "block_kv", "has_bias", "eps",
                     "norm_q", "norm_k", "interpret", "with_lse",
                     "int8_scores"))
def _flash_fused_packed_tpu(
    q, k, v, key_bias, tabs_q, tabs_k, heads: int,
    block_q: int, block_kv: int, has_bias: bool, eps: float,
    norm_q: bool, norm_k: bool, interpret: bool = False,
    with_lse: bool = False, int8_scores: bool = False,
):
    """q/k/v: merged [B, S, H*D]; returns [B, Sq, H*D] (+ row-layout lse)."""
    b, sq, hd = q.shape
    skv = k.shape[1]
    d = hd // heads
    hp = heads // 2
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_kv)
    has_bias = has_bias or skv_p != skv

    # operands stay in the NATURAL [B, S, H*D] layout — head pair p is the
    # contiguous column slice [p*2d, (p+1)*2d), so a (1, blk, 2d) BlockSpec
    # addresses it directly (strided rows, contiguous 2d*2B bursts). The old
    # [B, HP, S_p, 2D] pre-pack cost 5.8 ms/layer of XLA transposes at the
    # 18k shape (q,k,v pack + out unpack; measured tools/bench_attn_loop.py)
    # and forced cross-attention callers to re-pack 18k operands per call.
    def pack(x, s, s_p):
        return jnp.pad(x, ((0, 0), (0, s_p - s), (0, 0)))

    qp, kp, vp = pack(q, sq, sq_p), pack(k, skv, skv_p), pack(v, skv, skv_p)
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)),
                       constant_values=_NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E

    def norm_tabs(tabs, pad):
        cosg, sin, add, rg = _pack_tabs(tabs)
        batched = cosg.ndim == 3
        cosg, sin, add, rg = _pad_tabs((cosg, sin, add, rg), pad, batched)
        if not batched:
            cosg, sin, add = cosg[None], sin[None], add[None]
        return cosg, sin, add, rg, (cosg.shape[0] != 1)

    cq, sq_t, aq, rq, bq_batched = norm_tabs(tabs_q, sq_p - sq)
    ck, sk, ak, rk, bk_batched = norm_tabs(tabs_k, skv_p - skv)
    cq, sq_t, aq = cq * _LOG2E, sq_t * _LOG2E, aq * _LOG2E

    # max-free softmax: when both prologues normalize, |scores| is provably
    # bounded by the product of the per-side table bounds — fold the bound
    # into the bias so s <= 0 in-kernel (clipped: a pathological bound would
    # only cost softmax underflow, never overflow)
    no_max = norm_q and norm_k
    c_shift = None
    if no_max:
        c_shift = jnp.minimum(
            _tabs_score_bound(cq, sq_t, aq, rq)
            * _tabs_score_bound(ck, sk, ak, rk)
            + jnp.maximum(jnp.max(key_bias), 0.0), 120.0)
        key_bias = key_bias - c_shift
        has_bias = True

    d2 = 2 * d
    mu = jnp.block([
        [jnp.full((d, d), 1.0 / d, jnp.float32), jnp.zeros((d, d), jnp.float32)],
        [jnp.zeros((d, d), jnp.float32), jnp.full((d, d), 1.0 / d, jnp.float32)],
    ])

    def pin_after_first(i_, j_):
        # the kernel consumes k-side operands only during the i==0 sweep
        # (kn/vn persist in scratch for all later q chains of the pair);
        # pinning the fetch index to block 0 once i>0 makes consecutive
        # steps' indices equal, so Pallas elides the DMA — ~2 MB/step of
        # dead k/v/table traffic at the 18k joint shape
        return jnp.where(i_ > 0, 0, j_)

    def tab_spec(blk, batched, kv: bool):
        def imap(b_, h_, i_, j_):
            pos = pin_after_first(i_, j_) if kv else i_
            return (b_ if batched else 0, pos, 0)
        return pl.BlockSpec((1, blk, d2), imap)

    grid = (b, hp, sq_p // block_q, skv_p // block_kv)
    out_specs = pl.BlockSpec(
        (1, block_q, d2), lambda b_, h_, i, j: (b_, i, h_))
    out_shapes = jax.ShapeDtypeStruct((b, sq_p, hd), q.dtype)
    if with_lse:
        out_specs = (out_specs, pl.BlockSpec(
            (1, 1, block_q, d2), lambda b_, h_, i, j: (b_, h_, i, 0)))
        out_shapes = (out_shapes,
                      jax.ShapeDtypeStruct((b, hp, sq_p, d2), jnp.float32))
    assert not (with_lse and int8_scores), (
        "int8_scores is the inference turbo path; training keeps bf16")
    scratch_shapes = [
        pltpu.VMEM((2, block_q, _LANES), jnp.float32),
        pltpu.VMEM((2, block_q, _LANES), jnp.float32),
        pltpu.VMEM((block_q, d2), jnp.float32),
        pltpu.VMEM((block_q, d2), jnp.int8 if int8_scores else q.dtype),
        pltpu.VMEM((d2, 2 * skv_p), jnp.int8 if int8_scores else q.dtype),
        pltpu.VMEM((2 * skv_p, d2), q.dtype),
    ]
    if int8_scores:
        scratch_shapes += [pltpu.VMEM((block_q, _LANES), jnp.float32),
                           pltpu.VMEM((1, 2 * skv_p), jnp.float32)]
    res = pl.pallas_call(
        functools.partial(
            _flash_packed_kernel, has_bias=has_bias, block_kv=block_kv,
            eps=eps, norm_q=norm_q, norm_k=norm_k, with_lse=with_lse,
            no_max=no_max, int8_scores=int8_scores),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d2), lambda b_, h_, i, j: (b_, i, h_)),
            pl.BlockSpec((1, block_kv, d2),
                         lambda b_, h_, i, j: (b_, pin_after_first(i, j), h_)),
            pl.BlockSpec((1, block_kv, d2),
                         lambda b_, h_, i, j: (b_, pin_after_first(i, j), h_)),
            pl.BlockSpec((1, 1, block_kv), lambda b_, h_, i, j: (b_, 0, j)),
            tab_spec(block_q, bq_batched, False),
            tab_spec(block_q, bq_batched, False),
            tab_spec(block_q, bq_batched, False),
            pl.BlockSpec((d2, d2), lambda b_, h_, i, j: (0, 0)),
            tab_spec(block_kv, bk_batched, True),
            tab_spec(block_kv, bk_batched, True),
            tab_spec(block_kv, bk_batched, True),
            pl.BlockSpec((d2, d2), lambda b_, h_, i, j: (0, 0)),
            pl.BlockSpec((d2, d2), lambda b_, h_, i, j: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp, kp, vp, key_bias, cq, sq_t, aq, rq, ck, sk, ak, rk, mu)
    out, lse = res if with_lse else (res, None)
    out = out[:, :sq, :]
    if with_lse:
        # [B, HP, Sq_p, 128] (lanes 0/1 = heads A/B) -> row layout
        # [B, HP, 2, Sq_p] for the backward kernel's lane-wise broadcasts
        lse = lse[:, :, :, :2].transpose(0, 1, 3, 2)  # -> [B, HP, 2, Sq_p]
        if no_max:
            lse = lse + c_shift * _LN2  # undo the bias-folded shift
        return out, lse
    return out


# ---------------------------------------------------------------------------
# Small-side cross-attention kernels (VIP branches, func_types "1"-"4")
#
# The VIP cross shapes have one tiny side (tv->vip: kv=480; vip->all: q=480).
# The general packed kernel's grid (b, pair, i, j) re-fetches the f32 prologue
# tables for every pair (the table index depends on i/j, which change between
# pair sweeps) and runs its scratch machinery for sweeps of length 1. These
# variants make the PAIR axis innermost — consecutive grid steps keep the same
# table index, so Pallas elides the table DMA — and drop the machinery the
# degenerate sweep doesn't need. Inference-only: `_flash_packed_diff`'s
# custom_vjp fwd keeps the lse-producing packed kernel, so gradients are
# unchanged. Measured (tools/bench_cross_r3.py, v5e, production shapes):
# cross1 17776->480: 4.32 -> 3.73 ms; cross2 480->18256: 4.23 -> 3.87 ms.
# ---------------------------------------------------------------------------


def _cross_smallkv_kernel(q_ref, kt_ref, v2_ref, bias_ref,
                          cq_ref, sq_ref, aq_ref, rq_ref, mu_ref, o_ref, *,
                          skv_blk: int, eps: float, norm_q: bool):
    # one grid step = one (q block, head pair): prologue q, one score matmul
    # against the whole (pre-prologued, block-diagonal) K^T, softmax, one p@v
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
    lanes = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    l2 = jnp.where(lanes < q_ref.shape[-1] // 2, ls[0], ls[1])
    l2 = jnp.maximum(l2, jnp.finfo(jnp.float32).tiny)
    o_ref[0] = (acc / l2).astype(o_ref.dtype)


def _cross_norm_tabs(tabs, pad):
    cosg, sin, add, rg = _pack_tabs(tabs)
    batched = cosg.ndim == 3
    cosg, sin, add, rg = _pad_tabs((cosg, sin, add, rg), pad, batched)
    if not batched:
        cosg, sin, add = cosg[None], sin[None], add[None]
    return cosg, sin, add, rg, (cosg.shape[0] != 1)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "block_q", "eps", "norm_q", "norm_k",
                     "interpret"))
def _flash_cross_smallkv_tpu(q, k, v, key_bias, tabs_q, tabs_k, heads: int,
                             block_q: int, eps: float, norm_q: bool,
                             norm_k: bool, interpret: bool = False):
    """Cross attention with a single-block kv side (<=512 after padding)."""
    b, sq, hd = q.shape
    skv = k.shape[1]
    d = hd // heads
    d2 = 2 * d
    hp = heads // 2
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, _LANES)

    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)),
                       constant_values=_NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E

    cq, sq_t, aq, rq, bq_b = _cross_norm_tabs(tabs_q, sq_p - sq)
    ck, sk, ak, rk, _bk_b = _cross_norm_tabs(tabs_k, skv_p - skv)
    cq, sq_t, aq = cq * _LOG2E, sq_t * _LOG2E, aq * _LOG2E
    c_shift = jnp.minimum(
        _tabs_score_bound(cq, sq_t, aq, rq) * _tabs_score_bound(ck, sk, ak, rk)
        + jnp.maximum(jnp.max(key_bias), 0.0), 120.0)
    key_bias = key_bias - c_shift

    # K/V are tiny: prologue + block-diagonal packing in plain XLA. The
    # LayerNorm is per-HEAD (d), so it runs on the unpacked [b, H, skv, d]
    # view with the UNPACKED tables, then packs to head-pair layout.
    kn = _apply_prologue_xla(
        k.reshape(b, skv, heads, d).transpose(0, 2, 1, 3), tabs_k, eps,
        norm_k).astype(q.dtype)  # [b, H, skv, d]
    kn = kn.transpose(0, 2, 1, 3).reshape(b, skv, hp, d2).transpose(0, 2, 1, 3)
    kn = jnp.pad(kn, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))
    knt = kn.transpose(0, 1, 3, 2)  # [b, hp, d2, skv_p]
    cat = jnp.concatenate
    kt2 = cat([
        cat([knt[:, :, :d], jnp.zeros_like(knt[:, :, :d])], axis=2),
        cat([jnp.zeros_like(knt[:, :, d:]), knt[:, :, d:]], axis=2),
    ], axis=3)  # [b, hp, d2, 2*skv_p] block-diagonal
    v4 = vp.reshape(b, skv_p, hp, d2).transpose(0, 2, 1, 3)
    v2b = cat([
        cat([v4[..., :d], jnp.zeros_like(v4[..., :d])], axis=3),
        cat([jnp.zeros_like(v4[..., d:]), v4[..., d:]], axis=3),
    ], axis=2)  # [b, hp, 2*skv_p, d2]

    def tab_spec(blk, batched):
        return pl.BlockSpec((1, blk, d2),
                            lambda b_, i_, h_: (b_ if batched else 0, i_, 0))

    grid = (b, sq_p // block_q, hp)
    out = pl.pallas_call(
        functools.partial(_cross_smallkv_kernel, skv_blk=skv_p, eps=eps,
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
        interpret=interpret,
    )(qp, kt2, v2b, key_bias, cq, sq_t, aq, rq, _mu_packed(d2))
    return out[:, :sq, :]


def _cross_smallq_kernel(q_ref, k_ref, v_ref, bias_ref,
                         cq_ref, sq_ref, aq_ref, rq_ref,
                         ck_ref, sk_ref, ak_ref, rk_ref, mu_ref,
                         o_ref, acc_scr, l_scr, *,
                         block_kv: int, eps: float, norm_q: bool,
                         norm_k: bool):
    # grid (b, j_kv, pair): per-pair accumulators persist in scratch across
    # the j sweep; the k-side tables' index depends on j only, so their DMA
    # is elided across the inner pair sweep
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
                           jnp.where(rows >= dh, knt, 0)], axis=1)
    v = v_ref[0]
    lanes_v = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    v2 = jnp.concatenate([jnp.where(lanes_v < dh, v, 0),
                          jnp.where(lanes_v >= dh, v, 0)], axis=0)

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


@functools.partial(
    jax.jit,
    static_argnames=("heads", "block_kv", "eps", "norm_q", "norm_k",
                     "interpret"))
def _flash_cross_smallq_tpu(q, k, v, key_bias, tabs_q, tabs_k, heads: int,
                            block_kv: int, eps: float, norm_q: bool,
                            norm_k: bool, interpret: bool = False):
    """Cross attention with a single-block q side (<=512 after padding)."""
    b, sq, hd = q.shape
    skv = k.shape[1]
    d = hd // heads
    d2 = 2 * d
    hp = heads // 2
    sq_p = _round_up(sq, _LANES)
    skv_p = _round_up(skv, block_kv)

    qp = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))
    key_bias = jnp.pad(key_bias, ((0, 0), (0, skv_p - skv)),
                       constant_values=_NEG_INF)
    key_bias = key_bias[:, None, :] * _LOG2E

    cq, sq_t, aq, rq, bq_b = _cross_norm_tabs(tabs_q, sq_p - sq)
    ck, sk, ak, rk, bk_b = _cross_norm_tabs(tabs_k, skv_p - skv)
    cq, sq_t, aq = cq * _LOG2E, sq_t * _LOG2E, aq * _LOG2E
    c_shift = jnp.minimum(
        _tabs_score_bound(cq, sq_t, aq, rq) * _tabs_score_bound(ck, sk, ak, rk)
        + jnp.maximum(jnp.max(key_bias), 0.0), 120.0)
    key_bias = key_bias - c_shift

    def tab_spec(blk, batched, kv):
        def imap(b_, j_, h_):
            return (b_ if batched else 0, j_ if kv else 0, 0)
        return pl.BlockSpec((1, blk, d2), imap)

    grid = (b, skv_p // block_kv, hp)
    out = pl.pallas_call(
        functools.partial(_cross_smallq_kernel, block_kv=block_kv, eps=eps,
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
        interpret=interpret,
    )(qp, kp, vp, key_bias, cq, sq_t, aq, rq, ck, sk, ak, rk, _mu_packed(d2))
    return out[:, :sq, :]


def _mu_packed(d2):
    d = d2 // 2
    return jnp.block([
        [jnp.full((d, d), 1.0 / d, jnp.float32), jnp.zeros((d, d), jnp.float32)],
        [jnp.zeros((d, d), jnp.float32), jnp.full((d, d), 1.0 / d, jnp.float32)],
    ])


# ---------------------------------------------------------------------------
# Packed attention backward kernel
#
# The XLA blocked backward streams every [Sq, Skv] logit block through HBM
# (~60 GB per pass at the 18k joint shape -> ~700 ms vs the 62 ms forward).
# This kernel keeps all logit tiles in VMEM. Grid = (B, HP, j_kv, i_q): the
# inner i sweep accumulates dk/dv for kv block j in scratch; dq accumulates
# TRANSPOSED (dq^T[d, Sq]) into a grid-resident output block; the q-side
# operands (blockdiag Q / Q^T / G / G^T built like the forward's K scratch)
# are filled during the first j sweep and persist for all later j. All score
# work is recomputed from the saved natural-domain logsumexp:
#
#   p' = exp(kn_j @ qn_i^T + bias - lse)        [Bk, 2*Bq]  (transposed tiles)
#   dv_j += p' @ blockdiag(gA, gB)
#   ds' = p' * (v_j @ blockdiag(gA^T, gB^T) - dsum)
#   dk_j += ds' @ blockdiag(qA, qB)
#   dq^T[:, i] += [kA^T @ dsA'; kB^T @ dsB']    (two half matmuls)
#   dbias_j += row-sums of ds'
#
# qn/kn are the XLA-prologued tensors, so gradients flow to raw q/k and the
# prologue tables through `jax.vjp` of the (cheap, elementwise) prologue.
# ---------------------------------------------------------------------------


def _packed_bwd_kernel(
    qn_ref, kn_ref, v_ref, g_ref, lse_ref, dsum_ref, bias_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref,
    qt_scr, q2_scr, g2_scr, gt_scr, kt_scr, dk_scr, dv_scr, dbias_scr, *,
    block_q: int, has_bias: bool,
):
    j = pl.program_id(2)
    i = pl.program_id(3)
    num_i = pl.num_programs(3)
    d2 = qn_ref.shape[-1]
    dh = d2 // 2
    bq = qn_ref.shape[2]
    f32 = jnp.float32

    @pl.when(j == 0)
    def _build_q_side():
        # incremental build during the first kv sweep: block i is ready
        # exactly when this (j=0, i) step needs it, complete before j=1
        qn = qn_ref[0, 0]  # [Bq, 128]
        g = g_ref[0, 0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, qn.shape, 1)
        q2_scr[pl.ds(2 * i * block_q, block_q), :] = jnp.where(lanes < dh, qn, 0)
        q2_scr[pl.ds(2 * i * block_q + block_q, block_q), :] = jnp.where(
            lanes >= dh, qn, 0)
        g2_scr[pl.ds(2 * i * block_q, block_q), :] = jnp.where(lanes < dh, g, 0)
        g2_scr[pl.ds(2 * i * block_q + block_q, block_q), :] = jnp.where(
            lanes >= dh, g, 0)
        qt = qn.T  # [128, Bq]
        gt = g.T
        rows = jax.lax.broadcasted_iota(jnp.int32, qt.shape, 0)
        qt_scr[:, pl.ds(2 * i * block_q, block_q)] = jnp.where(rows < dh, qt, 0)
        qt_scr[:, pl.ds(2 * i * block_q + block_q, block_q)] = jnp.where(
            rows >= dh, qt, 0)
        gt_scr[:, pl.ds(2 * i * block_q, block_q)] = jnp.where(rows < dh, gt, 0)
        gt_scr[:, pl.ds(2 * i * block_q + block_q, block_q)] = jnp.where(
            rows >= dh, gt, 0)

    @pl.when(i == 0)
    def _init_kv():
        kt_scr[:] = kn_ref[0, 0].T  # [128, Bk], both heads' halves
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)
        dbias_scr[:] = jnp.zeros_like(dbias_scr)

    @pl.when(jnp.logical_and(j == 0, i == 0))
    def _init_dq():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])

    # transposed score tile [Bk, 2*Bq] = [sA^T | sB^T], natural domain
    s2 = jax.lax.dot_general(
        kn_ref[0, 0], qt_scr[:, pl.ds(2 * i * block_q, 2 * block_q)],
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    )
    # rows of lse_ref[0,0] ([2, Bq]): 0 = head A, 1 = head B -> [1, 2*Bq]
    lse_row = jnp.concatenate(
        [lse_ref[0, 0, :1, :], lse_ref[0, 0, 1:2, :]], axis=1)
    dsum_row = jnp.concatenate(
        [dsum_ref[0, 0, :1, :], dsum_ref[0, 0, 1:2, :]], axis=1)
    if has_bias:
        s2 = s2 + bias_ref[0, :, :1]  # per-key bias: column broadcast
    p2 = jnp.exp(s2 - lse_row)  # [Bk, 2*Bq]
    p2b = p2.astype(v_ref.dtype)

    dv_scr[:, :] += jax.lax.dot_general(
        p2b, g2_scr[pl.ds(2 * i * block_q, 2 * block_q), :],
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    dpv = jax.lax.dot_general(
        v_ref[0, 0], gt_scr[:, pl.ds(2 * i * block_q, 2 * block_q)],
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    ds = p2 * (dpv - dsum_row)
    dsb = ds.astype(v_ref.dtype)
    dk_scr[:, :] += jax.lax.dot_general(
        dsb, q2_scr[pl.ds(2 * i * block_q, 2 * block_q), :],
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    if has_bias:
        dbias_scr[:, :1] += jnp.sum(ds, axis=1, keepdims=True)

    # dq^T accumulation: dqH^T[dh, Bq] += kH^T [dh, Bk] @ dsH^T [Bk, Bq]
    ds_a = dsb[:, :block_q]
    ds_b = dsb[:, block_q:]
    kt = kt_scr[:]
    dq_a = jax.lax.dot_general(
        kt[0:dh, :], ds_a, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    dq_b = jax.lax.dot_general(
        kt[dh:, :], ds_b, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    dq_ref[0, 0, 0:dh, pl.ds(i * block_q, block_q)] += dq_a
    dq_ref[0, 0, dh:d2, pl.ds(i * block_q, block_q)] += dq_b

    @pl.when(i == num_i - 1)
    def _write_kv():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)
        if has_bias:
            dbias_ref[0, 0] = dbias_scr[:].astype(dbias_ref.dtype)
        else:
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])


@functools.partial(
    jax.jit,
    static_argnames=("heads", "block_q", "block_kv", "has_bias", "interpret"))
def _flash_packed_bwd_tpu(
    qn, kn, v, g, lse, dsum, key_bias, heads: int,
    block_q: int, block_kv: int, has_bias: bool, interpret: bool = False,
):
    """Backward for the packed kernel. qn/kn: PROLOGUED merged [B, S, H*D];
    v/g merged; lse/dsum [B, HP, 2, Sq_p] (natural domain / per-head row sums);
    key_bias [B, Skv] (natural domain). Returns (dqn, dkn, dv, dbias) with
    dqn/dkn/dv merged and dbias [B, Skv]."""
    b, sq, hd = qn.shape
    skv = kn.shape[1]
    d = hd // heads
    hp = heads // 2
    d2 = 2 * d
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_kv)
    has_bias = has_bias or skv_p != skv

    def pack(x, s, s_p):
        x = x.reshape(b, s, hp, d2).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_p - s), (0, 0)))

    qp = pack(qn, sq, sq_p)
    kp = pack(kn, skv, skv_p)
    vp = pack(v, skv, skv_p)
    gp = pack(g.astype(qn.dtype), sq, sq_p)
    lse = jnp.pad(lse, ((0, 0), (0, 0), (0, 0), (0, sq_p - lse.shape[-1])))
    dsum = jnp.pad(dsum, ((0, 0), (0, 0), (0, 0), (0, sq_p - dsum.shape[-1])))
    # bias as a column page [B, Skv_p, 128] (col 0) for sublane-wise broadcast
    bias_col = jnp.pad(key_bias.astype(jnp.float32),
                       ((0, 0), (0, skv_p - skv)), constant_values=_NEG_INF)
    bias_col = jnp.pad(bias_col[:, :, None], ((0, 0), (0, 0), (0, _LANES - 1)))

    grid = (b, hp, skv_p // block_kv, sq_p // block_q)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, block_q=block_q,
                          has_bias=has_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d2), lambda b_, h_, j, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d2), lambda b_, h_, j, i: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d2), lambda b_, h_, j, i: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_q, d2), lambda b_, h_, j, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, 2, block_q), lambda b_, h_, j, i: (b_, h_, 0, i)),
            pl.BlockSpec((1, 1, 2, block_q), lambda b_, h_, j, i: (b_, h_, 0, i)),
            pl.BlockSpec((1, block_kv, _LANES), lambda b_, h_, j, i: (b_, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, d2, sq_p), lambda b_, h_, j, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, block_kv, d2), lambda b_, h_, j, i: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d2), lambda b_, h_, j, i: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_kv, _LANES), lambda b_, h_, j, i: (b_, h_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, d2, sq_p), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, skv_p, d2), qn.dtype),
            jax.ShapeDtypeStruct((b, hp, skv_p, d2), qn.dtype),
            jax.ShapeDtypeStruct((b, hp, skv_p, _LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d2, 2 * sq_p), qn.dtype),   # qt blockdiag
            pltpu.VMEM((2 * sq_p, d2), qn.dtype),   # q2 blockdiag
            pltpu.VMEM((2 * sq_p, d2), qn.dtype),   # g2 blockdiag
            pltpu.VMEM((d2, 2 * sq_p), qn.dtype),   # gt blockdiag
            pltpu.VMEM((d2, block_kv), qn.dtype),   # k^T for this j
            pltpu.VMEM((block_kv, d2), jnp.float32),
            pltpu.VMEM((block_kv, d2), jnp.float32),
            pltpu.VMEM((block_kv, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, lse, dsum, bias_col)

    # dq^T [B, HP, 128, Sq_p] -> merged [B, Sq, H*D]
    dqn = dq[:, :, :, :sq].transpose(0, 3, 1, 2).reshape(b, sq, hd)
    dkn = dk[:, :, :skv, :].transpose(0, 2, 1, 3).reshape(b, skv, hd)
    dvm = dv[:, :, :skv, :].transpose(0, 2, 1, 3).reshape(b, skv, hd)
    dbias_out = jnp.sum(dbias[:, :, :skv, 0], axis=1)  # [B, Skv]
    return dqn.astype(qn.dtype), dkn, dvm, dbias_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _flash_fused_diff(block_q, block_kv, has_bias, eps, norm_q, norm_k,
                      q, k, v, key_bias, tabs_q, tabs_k):
    """Fused-prologue attention with gradients: forward is the Pallas kernel,
    backward recomputes the prologue in XLA (cheap: one pass over q/k) and
    chains `_blocked_attention_bwd` through it — giving grads for q/k/v/bias
    AND the prologue tables (through which the trainable qk-norm affine params
    and any traced rope tables receive their gradients)."""
    return _flash_fused_tpu(q, k, v, key_bias, tabs_q, tabs_k,
                            block_q, block_kv, has_bias, eps, norm_q, norm_k)


def _fused_diff_fwd(block_q, block_kv, has_bias, eps, norm_q, norm_k,
                    q, k, v, key_bias, tabs_q, tabs_k):
    out = _flash_fused_tpu(q, k, v, key_bias, tabs_q, tabs_k,
                           block_q, block_kv, has_bias, eps, norm_q, norm_k)
    return out, (q, k, v, key_bias, tabs_q, tabs_k, out)


def _fused_diff_bwd(block_q, block_kv, has_bias, eps, norm_q, norm_k, res, g):
    q, k, v, key_bias, tabs_q, tabs_k, out = res

    def prologue(q_, k_, tq_, tk_):
        return (_apply_prologue_xla(q_, tq_, eps, norm_q),
                _apply_prologue_xla(k_, tk_, eps, norm_k))

    (qn, kn), vjp_p = jax.vjp(prologue, q, k, tabs_q, tabs_k)
    # the fused op's scores are qn@kn^T (scale folded into tabs_q) -> scale=1
    dqn, dkn, dv, dbias = _blocked_attention_bwd(qn, kn, v, key_bias, out, g, 1.0)
    dq, dk, dtq, dtk = vjp_p((dqn.astype(qn.dtype), dkn.astype(kn.dtype)))
    return dq, dk, dv, dbias, dtq, dtk


_flash_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


def _xla_attention_fused(q, k, v, key_bias, tabs_q, tabs_k, eps, norm_q, norm_k):
    qn = _apply_prologue_xla(q, tabs_q, eps, norm_q)
    kn = _apply_prologue_xla(k, tabs_k, eps, norm_k)
    return _xla_attention(qn, kn, v, key_bias, 1.0)


def _split3(x, heads):
    b, s, hd = x.shape
    return x.reshape(b, s, heads, hd // heads).transpose(0, 2, 1, 3)


def _merge3(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _flash_packed_diff(heads, block_q, block_kv, has_bias, eps, norm_q, norm_k,
                       int8_scores, q, k, v, key_bias, tabs_q, tabs_k):
    """Packed head-pair kernel with gradients (merged [B, S, H*D] operands);
    backward recomputes the prologue in XLA on the 4-D view and chains
    `_blocked_attention_bwd` — identical math to `_flash_fused_diff`.

    ``int8_scores`` quantizes the score matmul to int8 (inference primal
    only; under jax.grad the bf16 lse-producing forward runs instead)."""
    # inference primal only (under jax.grad the custom_vjp fwd below runs
    # instead): route one-tiny-side cross shapes to the specialized
    # pair-innermost kernels — the VIP branches' tv->vip / vip->all calls
    if norm_q and norm_k:
        sq, skv = q.shape[1], k.shape[1]
        if skv <= 512 and sq > 2048:
            return _flash_cross_smallkv_tpu(q, k, v, key_bias, tabs_q, tabs_k,
                                            heads, 2048, eps, norm_q, norm_k)
        if sq <= 512 and skv > 2048:
            return _flash_cross_smallq_tpu(q, k, v, key_bias, tabs_q, tabs_k,
                                           heads, 2048, eps, norm_q, norm_k)
    return _flash_fused_packed_tpu(q, k, v, key_bias, tabs_q, tabs_k, heads,
                                   block_q, block_kv, has_bias, eps,
                                   norm_q, norm_k, int8_scores=int8_scores)


def _packed_diff_fwd(heads, block_q, block_kv, has_bias, eps, norm_q, norm_k,
                     int8_scores, q, k, v, key_bias, tabs_q, tabs_k):
    out, lse = _flash_fused_packed_tpu(q, k, v, key_bias, tabs_q, tabs_k,
                                       heads, block_q, block_kv, has_bias,
                                       eps, norm_q, norm_k, with_lse=True)
    return out, (q, k, v, key_bias, tabs_q, tabs_k, out, lse)


def _packed_diff_bwd(heads, block_q, block_kv, has_bias, eps, norm_q, norm_k,
                     int8_scores, res, g):
    import os

    q, k, v, key_bias, tabs_q, tabs_k, out, lse = res

    def prologue_m(q_, k_, tq_, tk_):
        # prologue on the merged layout (cheap elementwise; grads for the
        # qk-norm affine params and traced rope tables flow through here)
        qn4 = _apply_prologue_xla(_split3(q_, heads), tq_, eps, norm_q)
        kn4 = _apply_prologue_xla(_split3(k_, heads), tk_, eps, norm_k)
        return _merge3(qn4), _merge3(kn4)

    (qn, kn), vjp_p = jax.vjp(prologue_m, q, k, tabs_q, tabs_k)
    if os.environ.get("TOKENSGEN_XLA_ATTN_BWD", "0") == "1":
        dqn4, dkn4, dv4, dbias = _blocked_attention_bwd(
            _split3(qn, heads), _split3(kn, heads), _split3(v, heads),
            key_bias, _split3(out, heads), _split3(g, heads), 1.0)
        dqn, dkn, dvm = _merge3(dqn4), _merge3(dkn4), _merge3(dv4)
    else:
        b = q.shape[0]
        hp = heads // 2
        # per-head row sums of g*out -> [B, HP, 2, Sq] row layout
        go = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            b, -1, hp, 2, q.shape[2] // heads).sum(-1)  # [B, Sq, HP, 2]
        dsum = go.transpose(0, 2, 3, 1)  # [B, HP, 2, Sq]
        dqn, dkn, dvm, dbias = _flash_packed_bwd_tpu(
            qn, kn, v, g, lse, dsum, key_bias, heads, block_q, block_kv,
            has_bias)
    dq, dk, dtq, dtk = vjp_p((dqn.astype(qn.dtype), dkn.astype(kn.dtype)))
    return dq, dk, dvm, dbias, dtq, dtk


_flash_packed_diff.defvjp(_packed_diff_fwd, _packed_diff_bwd)


def fused_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    tabs_q,
    tabs_k,
    key_bias: Optional[jnp.ndarray] = None,
    heads: Optional[int] = None,
    eps: float = 1e-6,
    norm_q: bool = True,
    norm_k: bool = True,
    block_q: int = 1024,
    block_kv: int = 1024,
    tp_axis: Optional[str] = None,
    sp_axis: Optional[str] = None,
    int8_scores: bool = False,
) -> jnp.ndarray:
    """Attention with the qk-norm + RoPE prologue fused into the kernel.

    ``int8_scores``: quantize the score matmul to int8 (per-q-block scalar +
    per-kv-column dynamic scales; the qk-norm prologue uniformizes row norms
    so coarse scales lose little). Inference-only serving turbo — gradients
    and the non-packed fallbacks keep bf16 scores.

    Operands are either 4-D [B, H, S, D] or merged 3-D [B, S, H*D] (pass
    ``heads``; preferred — the merged layout avoids the 2x lane padding of a
    d=64 minor dim and dispatches to the packed head-pair kernel on TPU).

    ``tabs_q``/``tabs_k``: (cosg, sin, add, Rg) from :func:`make_prologue`;
    build the q-side tables with ``fold=scale`` (softmax scale) — the kernel
    computes softmax over ``prologue(q) @ prologue(k)^T + key_bias``.
    ``norm_q``/``norm_k`` toggle the LayerNorm part (rope-only when False).

    ``sp_axis``: Ulysses-style sequence parallelism (sharding/sp.py pattern,
    SURVEY §2.3 optional SP target), mutually exclusive with ``tp_axis`` and
    merged-layout only. Operands live sequence-sharded on this mesh axis; an
    in-shard ``all_to_all`` re-shards seq<->heads so each device runs the
    unchanged kernel over the FULL sequence for its H/n local heads, then the
    inverse ``all_to_all`` restores sequence sharding. The prologue tables are
    per-position/head-agnostic and stay replicated. Requires an ambient mesh
    and Sq, Skv, H divisible by the axis size — the production joint sequence
    (18,256 = 226 text + 17,550 video + 480 vip) divides by 2/4/8/16.
    """
    merged = q.ndim == 3
    if merged:
        assert heads is not None
        b, sq, hd = q.shape
        h, d = heads, hd // heads
        skv = k.shape[1]
    else:
        b, h, sq, d = q.shape
        skv = k.shape[2]
    has_bias = key_bias is not None
    if key_bias is None:
        key_bias = jnp.zeros((b, skv), dtype=jnp.float32)
    else:
        key_bias = key_bias.astype(jnp.float32)

    if sp_axis is not None:
        from jax.sharding import PartitionSpec as P

        assert tp_axis is None, "sp_axis and tp_axis are mutually exclusive"
        assert merged, "sp_axis supports the merged [B, S, H*D] layout only"
        nsp = jax.sharding.get_abstract_mesh().shape[sp_axis]
        assert sq % nsp == 0 and skv % nsp == 0 and h % nsp == 0, (
            f"sp_axis={sp_axis}({nsp}) must divide Sq={sq}, Skv={skv}, H={h}")
        ss = P(None, sp_axis, None)
        ts = jax.tree_util.tree_map(lambda _: P(), (tabs_q, tabs_k))

        def _sp_local(q_, k_, v_, bias_, tq_, tk_):
            # seq-sharded [B, S/n, H*D] -> head-sharded [B, S, (H/n)*D]
            def fwd(x):
                return jax.lax.all_to_all(x, sp_axis, split_axis=2,
                                          concat_axis=1, tiled=True)

            o = _fused_dispatch(fwd(q_), fwd(k_), fwd(v_), bias_, tq_, tk_,
                                h // nsp, has_bias, eps, norm_q, norm_k,
                                block_q, block_kv, int8_scores)
            return jax.lax.all_to_all(o, sp_axis, split_axis=1,
                                      concat_axis=2, tiled=True)

        return jax.shard_map(
            _sp_local,
            in_specs=(ss, ss, ss, P(None, None)) + tuple(ts),
            out_specs=ss,
        )(q, k, v, key_bias, tabs_q, tabs_k)

    if tp_axis is not None:
        from jax.sharding import PartitionSpec as P

        if merged:
            ntp = jax.sharding.get_abstract_mesh().shape[tp_axis]
            hs = P(None, None, tp_axis)
            h_local = h // ntp
        else:
            hs = P(None, tp_axis, None, None)
            h_local = None
        ts = jax.tree_util.tree_map(lambda _: P(), (tabs_q, tabs_k))
        return jax.shard_map(
            lambda q_, k_, v_, bias_, tq_, tk_: _fused_dispatch(
                q_, k_, v_, bias_, tq_, tk_, h_local, has_bias, eps,
                norm_q, norm_k, block_q, block_kv, int8_scores),
            in_specs=(hs, hs, hs, P(None, None)) + tuple(ts),
            out_specs=hs,
        )(q, k, v, key_bias, tabs_q, tabs_k)
    return _fused_dispatch(q, k, v, key_bias, tabs_q, tabs_k,
                           heads if merged else None, has_bias, eps,
                           norm_q, norm_k, block_q, block_kv, int8_scores)


def _fused_dispatch(q, k, v, key_bias, tabs_q, tabs_k, heads, has_bias, eps,
                    norm_q, norm_k, block_q, block_kv, int8_scores=False):
    merged = heads is not None
    if merged:
        sq, skv = q.shape[1], k.shape[1]
        d = q.shape[2] // heads
    else:
        sq, skv = q.shape[2], k.shape[2]
        d = q.shape[3]
    on_tpu = jax.default_backend() == "tpu"
    bq = min(block_q, _round_up(sq, 128))
    bkv = min(block_kv, _round_up(skv, 128))
    if merged:
        # packed head-pair kernel: head pairs share a 128-wide feature slot;
        # 2x q-blocks measured slightly faster at the 18k joint shape
        if on_tpu and heads % 2 == 0 and (2 * d) % _LANES == 0:
            bq = min(2 * block_q, _round_up(sq, 128))
            return _flash_packed_diff(heads, bq, bkv, has_bias, eps,
                                      norm_q, norm_k, int8_scores,
                                      q, k, v, key_bias, tabs_q, tabs_k)
        q, k, v = _split3(q, heads), _split3(k, heads), _split3(v, heads)
        if on_tpu:
            out = _flash_fused_diff(bq, bkv, has_bias, eps, norm_q, norm_k,
                                    q, k, v, key_bias, tabs_q, tabs_k)
        else:
            out = _xla_attention_fused(q, k, v, key_bias, tabs_q, tabs_k,
                                       eps, norm_q, norm_k)
        return _merge3(out)
    if on_tpu:
        return _flash_fused_diff(bq, bkv, has_bias, eps, norm_q, norm_k,
                                 q, k, v, key_bias, tabs_q, tabs_k)
    return _xla_attention_fused(q, k, v, key_bias, tabs_q, tabs_k,
                                eps, norm_q, norm_k)


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

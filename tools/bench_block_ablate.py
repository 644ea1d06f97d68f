"""Ablate DiT block stages in a scan loop (amortizes dispatch overhead) to find
the true per-layer cost of each stage at the To2V production shape."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from tokensgen_tpu.core.rope import apply_rotary_emb, get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import DiTBlock, DiTConfig, VIPConfig


def _split_heads(x, heads):
    b, s, _ = x.shape
    return x.reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
from tokensgen_tpu.models.layers import LayerNorm


def sync(x):
    return [float(jnp.sum(l.astype(jnp.float32)))
            for l in jax.tree_util.tree_leaves(x) if hasattr(l, "astype")]


def timed_scan(name, body, x0, n=10, flops=None, consts=None):
    # consts (e.g. weights) are passed as jit args so they are NOT embedded as
    # literal constants in the uploaded program (axon remote-compile 413s)
    consts = consts if consts is not None else ()

    @jax.jit
    def run(x, *cs):
        y, _ = jax.lax.scan(lambda c, _: (body(c, *cs), None), x, None, length=n)
        return y

    sync(run(x0, *consts))
    t0 = time.time()
    sync(run(x0, *consts))
    dt = (time.time() - t0) / n
    tf = f" {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:52s} {dt*1e3:8.2f} ms/layer{tf}", flush=True)
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    f, hp, wp = 13, 30, 45
    s_video, s_text, s_vip = f * hp * wp, 226, 480
    heads, d, inner = 48, 64, 3072
    key = jax.random.PRNGKey(0)
    dt_ = jnp.bfloat16

    cfg = DiTConfig.cogvideox_5b(num_layers=1, vip=VIPConfig())
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp), np.arange(wp))
    vip_rope = get_3d_rotary_pos_embed_v2(d, np.arange(f) + 1000, np.arange(hp), np.arange(wp))
    cond_rope = get_3d_rotary_pos_embed_v2(d, np.arange(5) + 1000, np.arange(8), np.arange(12))

    block = DiTBlock(cfg)
    hidden = jax.random.normal(key, (b, s_video, inner), dt_)
    text = jax.random.normal(key, (b, s_text, inner), dt_)
    vip = jax.random.normal(key, (b, s_vip, inner), dt_)
    temb = jax.random.normal(key, (b, f, 512), dt_)
    ropes = (rope, vip_rope, cond_rope)
    carry0 = (hidden, text, vip, temb, ropes, None, None)
    params = block.init(key, carry0, None)

    def block_body(c, prm):
        h_, t_, v_ = c
        out = block.apply(prm, (h_, t_, v_, temb, ropes, None, None), None)[0]
        return (out[0], out[1], out[2])

    timed_scan("full DiTBlock", block_body, (hidden, text, vip), consts=(params,))

    # base qkv: 3 matmuls on joint seq, + split heads
    tv = jnp.concatenate([text, hidden], axis=1)
    wq = jax.random.normal(key, (inner, inner), dt_)
    wk = jax.random.normal(key, (inner, inner), dt_)
    wv = jax.random.normal(key, (inner, inner), dt_)
    w3 = jax.random.normal(key, (inner, 3 * inner), dt_)
    sj = tv.shape[1]

    def qkv3(c, wq_, wk_, wv_):
        q = _split_heads(c @ wq_, heads)
        k = _split_heads(c @ wk_, heads)
        v = _split_heads(c @ wv_, heads)
        return (q.transpose(0, 2, 1, 3).reshape(b, sj, inner)
                + k.transpose(0, 2, 1, 3).reshape(b, sj, inner)
                + v.transpose(0, 2, 1, 3).reshape(b, sj, inner)).astype(dt_)

    timed_scan("qkv 3 matmuls + split/merge heads", qkv3, tv,
               flops=3 * 2 * sj * inner * inner, consts=(wq, wk, wv))

    def qkvf(c, w3_):
        x = (c @ w3_).reshape(b, sj, 3, heads, d)
        return jnp.sum(x, axis=2).reshape(b, sj, inner).astype(dt_)

    timed_scan("fused qkv 1 matmul (no transpose)", qkvf, tv,
               flops=2 * sj * inner * 3 * inner, consts=(w3,))

    # qk-norm + rope on [B,H,S,D]
    ln = LayerNorm(epsilon=1e-6)
    qh = jax.random.normal(key, (b, heads, sj, d), dt_)
    pln = ln.init(key, qh)

    def qknorm_rope(c, pln_):
        y = ln.apply(pln_, c)
        y = jnp.concatenate(
            [y[:, :, :s_text], apply_rotary_emb(y[:, :, s_text:], rope)], axis=2)
        return y.astype(dt_)

    timed_scan("qknorm+rope(concat) [B,H,S,D]", qknorm_rope, qh, consts=(pln,))

    # identity-padded full-length rope (no concat)
    cos, sin = rope
    cos_full = jnp.concatenate([jnp.ones((s_text, d), cos.dtype), cos], axis=0)
    sin_full = jnp.concatenate([jnp.zeros((s_text, d), sin.dtype), sin], axis=0)

    def qknorm_rope_full(c, pln_, cf, sf):
        y = ln.apply(pln_, c)
        y = apply_rotary_emb(y, (cf, sf))
        return y.astype(dt_)

    timed_scan("qknorm+rope(identity tables)", qknorm_rope_full, qh,
               consts=(pln, cos_full, sin_full))

    def just_ln(c, pln_):
        return ln.apply(pln_, c).astype(dt_)

    timed_scan("qknorm LN only [B,H,S,D]", just_ln, qh, consts=(pln,))

    # transpose cost [B,S,H,D] -> [B,H,S,D]
    qs = jax.random.normal(key, (b, sj, heads, d), dt_)

    def tr(c):
        y = c.transpose(0, 2, 1, 3) + 1
        return y.transpose(0, 2, 1, 3)

    timed_scan("2x transpose [B,S,H,D]<->[B,H,S,D]", tr, qs)

    # AdaLN norm1 equivalent
    from tokensgen_tpu.models.layers import AdaLNZero
    ada = AdaLNZero(inner, dtype=dt_)
    pada = ada.init(key, hidden, text, temb)

    def ada_body(c, pada_):
        nh, nt, g, tg = ada.apply(pada_, c, text, temb)
        return (nh + g).astype(dt_)

    timed_scan("AdaLNZero (video+text, gates)", ada_body, hidden, consts=(pada,))

    # glue isolation: the same block with the attention KERNELS stubbed to a
    # cheap linear map (projections, AdaLN, concats, gates, FF all remain) —
    # full block minus this = true attention-kernel time in context; this
    # minus matmul floors = the layout/elementwise glue
    import tokensgen_tpu.models.dit as dit_mod
    real_attn = dit_mod.fused_flash_attention

    def stub_attn(q_, k_, v_, tq_, tk_, **kw):
        return q_.astype(dt_)

    dit_mod.fused_flash_attention = stub_attn
    try:
        block2 = DiTBlock(cfg)
        params2 = block2.init(key, carry0, None)

        def block_body2(c, prm):
            h_, t_, v_ = c
            out = block2.apply(prm, (h_, t_, v_, temb, ropes, None, None), None)[0]
            return (out[0], out[1], out[2])

        timed_scan("DiTBlock, attention stubbed", block_body2,
                   (hidden, text, vip), consts=(params2,))
    finally:
        dit_mod.fused_flash_attention = real_attn

    # ---- joint-layout prototype: one [text‖video] array end-to-end ----
    # Flop-identical to DiTBlock func_type "1" (same projections, same three
    # attention kernels, same FF work incl. the vip pass), but: no per-layer
    # concat/split of text vs video, AdaLN modulation applied jointly via
    # broadcast-concat tables, gates joint. Measures the layout glue's cost.
    from tokensgen_tpu.kernels.attention import (
        fused_flash_attention, make_prologue, slice_tabs)

    sj = s_text + s_video
    sm = d ** -0.5
    g_ln = jnp.abs(jax.random.normal(jax.random.PRNGKey(31), (d,))) + 0.5
    b_ln = 0.1 * jax.random.normal(jax.random.PRNGKey(32), (d,))
    base_segs = [(None, s_text), (rope, s_video)]
    tq_b = make_prologue(d, base_segs, g_ln, b_ln, fold=sm)
    tk_b = make_prologue(d, base_segs, g_ln, b_ln)
    vsegs = [(None, s_text), (vip_rope, s_video), (cond_rope, s_vip)]
    vtq = make_prologue(d, vsegs, g_ln, b_ln, fold=sm)
    vtk = make_prologue(d, vsegs, g_ln, b_ln)
    tq_tv, tk_vip = slice_tabs(vtq, 0, sj), slice_tabs(vtk, sj, sj + s_vip)
    tq_vip = slice_tabs(vtq, sj, sj + s_vip)

    wqkv = jax.random.normal(key, (inner, 3 * inner), dt_) * 0.02
    wvqkv = jax.random.normal(key, (inner, 3 * inner), dt_) * 0.02
    wout = jax.random.normal(key, (inner, inner), dt_) * 0.02
    wmod = jax.random.normal(key, (512, 6 * inner), dt_) * 0.02
    wvmod = jax.random.normal(key, (512, 3 * inner), dt_) * 0.02
    wff1 = jax.random.normal(key, (inner, 4 * inner), dt_) * 0.02
    wff2 = jax.random.normal(key, (4 * inner, inner), dt_) * 0.02
    ln_eps = 1e-6

    def _ln(x):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        dlt = x32 - mu
        var = jnp.mean(dlt * dlt, axis=-1, keepdims=True)
        return (dlt * jax.lax.rsqrt(var + ln_eps)).astype(x.dtype)

    hw_ = hp * wp

    def joint_mod(m_text, m_vid):
        # [B,1,D] text row + [B,F,D] per-frame rows -> [B,Sj,D] (lazy ops;
        # XLA fuses broadcast/repeat/concat into the elementwise consumer)
        return jnp.concatenate([
            jnp.broadcast_to(m_text, (b, s_text, inner)),
            jnp.repeat(m_vid, hw_, axis=1)], axis=1)

    def joint_adaln(tv_, temb_, w):
        mods = jax.nn.silu(temb_) @ w  # [B,F,6D]
        sh, sc, g6, esh, esc, eg = jnp.split(mods, 6, axis=-1)
        n = _ln(tv_)
        ntv = n * (1 + joint_mod(esc[:, :1], sc)) + joint_mod(esh[:, :1], sh)
        return ntv.astype(dt_), joint_mod(eg[:, :1], g6)

    def block_v2(c, wqkv_, wvqkv_, wout_, wmod_, wvmod_, wff1_, wff2_):
        tv_, vip_ = c
        ntv, gate1 = joint_adaln(tv_, temb, wmod_)
        vmods = jax.nn.silu(temb) @ wvmod_
        vsh, vsc, vg = jnp.split(vmods, 3, axis=-1)
        nvip = (_ln(vip_) * (1 + vsc[:, :1]) + vsh[:, :1]).astype(dt_)

        qkv = ntv @ wqkv_
        q, k_, v_ = jnp.split(qkv, 3, axis=-1)
        out = fused_flash_attention(q, k_, v_, tq_b, tk_b, heads=heads)
        vqkv = jnp.concatenate([ntv, nvip], axis=1) @ wvqkv_
        vq, vk, vv = jnp.split(vqkv, 3, axis=-1)
        c1 = fused_flash_attention(
            vq[:, :sj], vk[:, sj:], vv[:, sj:], tq_tv, tk_vip, heads=heads)
        c2 = fused_flash_attention(vq[:, sj:], vk, vv, tq_vip, vtk, heads=heads)
        merged = jnp.concatenate([out + 0.6 * c1, c2], axis=1) @ wout_
        tv2 = tv_ + gate1 * merged[:, :sj]
        vip2 = vip_ + vg[:, :1] * merged[:, sj:]

        ntv2, gate2 = joint_adaln(tv2, temb, wmod_)
        ff = jax.nn.gelu(ntv2 @ wff1_, approximate=True) @ wff2_
        tv3 = tv2 + gate2 * ff
        nvip2 = (_ln(vip2) * (1 + vsc[:, :1]) + vsh[:, :1]).astype(dt_)
        vff = jax.nn.gelu(nvip2 @ wff1_, approximate=True) @ wff2_
        vip3 = vip2 + vg[:, :1] * vff
        return (tv3.astype(dt_), vip3.astype(dt_))

    tv0 = jnp.concatenate([text, hidden], axis=1)
    timed_scan("joint-layout block_v2 prototype", block_v2, (tv0, vip),
               consts=(wqkv, wvqkv, wout, wmod, wvmod, wff1, wff2))


if __name__ == "__main__":
    main()

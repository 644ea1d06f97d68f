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
    b, f, hp, wp = 1, 13, 30, 45
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


if __name__ == "__main__":
    main()

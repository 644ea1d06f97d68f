"""Per-component timing breakdown of the To2V 5b DiT forward on one TPU chip.

Times, at the production To2V shape (13 latent frames 720x480 + 226 text +
480 VIP tokens, joint seq 18,256, bf16):

  * one full DiTBlock body (the scan step) — the unit the 42-layer forward scales,
  * the Pallas flash attention alone at the base joint shape,
  * the raw dense matmuls (qkv/out/ff) at the same token count,
  * AdaLN / QKNorm+RoPE elementwise stages in isolation.

Usage: python tools/bench_dit_parts.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.kernels.attention import flash_attention
from tokensgen_tpu.models.dit import DiTBlock, DiTConfig, VIPConfig
from tokensgen_tpu.models.layers import AdaLNZero, FeedForward, LayerNorm


def _fetch(out):
    # axon's remote platform makes block_until_ready a no-op; force a real
    # device round-trip by reading back a scalar reduction of every output leaf
    leaves = jax.tree_util.tree_leaves(out)
    return [float(jnp.sum(x.astype(jnp.float32))) for x in leaves
            if hasattr(x, "astype")]


def timed(name, fn, *args, iters=5, flops=None):
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / iters
    tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:44s} {dt * 1e3:9.2f} ms{tf}", flush=True)
    return dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    f, hp, wp = 13, 30, 45
    s_video, s_text, s_vip = f * hp * wp, 226, 480
    seq = s_text + s_video  # 17,776 joint text+video
    d, heads, inner = 64, 48, 3072
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
    carry = (hidden, text, vip, temb, ropes, None, None)
    params = block.init(key, carry, None)

    blk = jax.jit(lambda p, c: block.apply(p, c, None)[0][0])
    # flops: dense qkv/out 4 + vip qkv 3 over joint seq, ff over joint + vip ff
    sj = seq + s_vip
    dense_fl = b * (2 * sj * 7 * inner * inner + 2 * sj * 2 * inner * 4 * inner
                    + 2 * s_vip * 2 * inner * 4 * inner)
    attn_fl = b * (4 * sj * sj * inner + 4 * sj * s_vip * inner
                   + 4 * s_vip * (sj + s_vip) * inner)
    timed("full DiTBlock (scan body, vip)", blk, params, carry,
          flops=dense_fl + attn_fl)

    # attention alone at the base joint shape [B, 48, 18256, 64]
    q = jax.random.normal(key, (b, heads, sj, d), dt_)
    k = jax.random.normal(key, (b, heads, sj, d), dt_)
    v = jax.random.normal(key, (b, heads, sj, d), dt_)
    attn = jax.jit(lambda q_, k_, v_: flash_attention(q_, k_, v_))
    timed("flash attention [B,48,18256,64]", attn, q, k, v,
          flops=b * 4 * sj * sj * inner)

    # dense matmuls at the joint token count
    x = jax.random.normal(key, (b * sj, inner), dt_)
    w1 = jax.random.normal(key, (inner, inner), dt_)
    w4 = jax.random.normal(key, (inner, 4 * inner), dt_)
    w4b = jax.random.normal(key, (4 * inner, inner), dt_)
    mm = jax.jit(lambda x_, w_: x_ @ w_)
    timed("matmul [18256B,3072]x[3072,3072]", mm, x, w1,
          flops=2 * b * sj * inner * inner)
    timed("matmul [18256B,3072]x[3072,12288]", mm, x, w4,
          flops=2 * b * sj * inner * 4 * inner)
    xi = jax.random.normal(key, (b * sj, 4 * inner), dt_)
    timed("matmul [18256B,12288]x[12288,3072]", mm, xi, w4b,
          flops=2 * b * sj * 4 * inner * inner)

    # ff (two matmuls + gelu)
    ff = FeedForward(inner, dtype=dt_)
    xs = jax.random.normal(key, (b, sj, inner), dt_)
    pff = ff.init(key, xs)
    ffj = jax.jit(ff.apply)
    timed("FeedForward joint seq", ffj, pff, xs,
          flops=2 * b * sj * 2 * inner * 4 * inner)

    # AdaLN alone
    ada = AdaLNZero(inner, dtype=dt_)
    pada = ada.init(key, hidden, text, temb)
    adaj = jax.jit(lambda p, h_, t_, e_: ada.apply(p, h_, t_, e_))
    timed("AdaLNZero (norm+mod, video+text)", adaj, pada, hidden, text, temb)

    # qk-norm + rope (the attention pre-processing path)
    ln = LayerNorm(epsilon=1e-6)
    qh = jax.random.normal(key, (b, heads, sj, d), dt_)
    pln = ln.init(key, qh)

    from tokensgen_tpu.core.rope import apply_rotary_emb

    def qknorm_rope(p, x_):
        y = ln.apply(p, x_)
        return jnp.concatenate(
            [y[:, :, :s_text], apply_rotary_emb(y[:, :, s_text:s_text + s_video], rope),
             y[:, :, s_text + s_video:]], axis=2)

    timed("QKNorm + rope(video part) [one of q,k]", jax.jit(qknorm_rope), pln, qh)

    # layernorm alone at joint shape
    ln2 = LayerNorm()
    pln2 = ln2.init(key, xs)
    timed("LayerNorm [B,18256,3072]", jax.jit(ln2.apply), pln2, xs)


if __name__ == "__main__":
    main()

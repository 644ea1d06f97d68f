"""In-device loop timings of the per-layer attention work (r3).

The standalone per-call timings in bench_attn_r3.py carry ~2-3 ms of axon
dispatch overhead per jit call, which swamps the small VIP cross-attentions.
Here every configuration runs inside one `fori_loop` whose iterations chain
(output feeds the next input), so the per-iteration cost is the true on-chip
cost — the same form the DiT block scan executes.

Usage: python tools/bench_attn_loop.py
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

from tokensgen_tpu.kernels import attention as A

ITERS = 10


def loop_timed(name, step, x0, args, flops=None):
    jitted = jax.jit(lambda x, a: jax.lax.fori_loop(
        0, ITERS, lambda i, acc: step(acc, a), x))
    float(jnp.sum(jitted(x0, args).astype(jnp.float32)))
    t0 = time.time()
    out = jitted(x0, args)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:46s} {dt * 1e3:9.2f} ms/iter{tf}", flush=True)
    return dt


def main():
    b = 1
    f, hp_, wp_ = 13, 30, 45
    s_text, s_vip = 226, 480
    sq = s_text + f * hp_ * wp_
    heads, d = 48, 64
    hd = heads * d
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, sq, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, sq, hd), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, sq, hd), jnp.bfloat16)
    kv_ = jax.random.normal(jax.random.PRNGKey(5), (b, s_vip, hd), jnp.bfloat16)
    vv_ = jax.random.normal(jax.random.PRNGKey(6), (b, s_vip, hd), jnp.bfloat16)
    qv = jax.random.normal(jax.random.PRNGKey(7), (b, s_vip, hd), jnp.bfloat16)
    g = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (d,))) + 0.5
    bs_ = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (d,))

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp_), np.arange(wp_))
    vip_rope = get_3d_rotary_pos_embed_v2(d, np.arange(f) + 1000, np.arange(hp_),
                                          np.arange(wp_))
    cond_rope = get_3d_rotary_pos_embed_v2(d, np.arange(5) + 1000, np.arange(8),
                                           np.arange(12))
    segs = [(None, s_text), (rope, sq - s_text)]
    tq = A.make_prologue(d, segs, g, bs_, fold=d**-0.5)
    tk = A.make_prologue(d, segs, g, bs_)
    vsegs = [(None, s_text), (vip_rope, sq - s_text), (cond_rope, s_vip)]
    vtq = A.make_prologue(d, vsegs, g, bs_, fold=d**-0.5)
    vtk = A.make_prologue(d, vsegs, g, bs_)
    tq_tv = A.slice_tabs(vtq, 0, sq)
    tk_vip = A.slice_tabs(vtk, sq, sq + s_vip)
    tq_vip = A.slice_tabs(vtq, sq, sq + s_vip)

    fl_base = 4 * b * sq * sq * hd
    fl_c1 = 4 * b * sq * s_vip * hd
    fl_c2 = 4 * b * s_vip * (sq + s_vip) * hd

    # base attention alone (chained: output becomes the next q)
    def base_step(x, a):
        k_, v_ = a
        return A.fused_flash_attention(x, k_, v_, tq, tk, heads=heads)

    t_base = loop_timed("base joint attn (in-loop)", base_step, q, (k, v),
                        flops=fl_base)

    # base + both vip cross attns, wired exactly as JointVIPAttention "1"
    def full_step(x, a):
        k_, v_, kv2, vv2, qv_ = a
        out = A.fused_flash_attention(x, k_, v_, tq, tk, heads=heads)
        c1 = A.fused_flash_attention(x, kv2, vv2, tq_tv, tk_vip, heads=heads)
        vip_out = A.fused_flash_attention(
            qv_, jnp.concatenate([k_, kv2], axis=1),
            jnp.concatenate([v_, vv2], axis=1), tq_vip, vtk, heads=heads)
        return out + 0.6 * c1 + 0.0 * jnp.pad(
            vip_out, ((0, 0), (0, sq - s_vip), (0, 0)))

    t_full = loop_timed("base + cross1 + cross2 (model wiring)", full_step, q,
                        (k, v, kv_, vv_, qv), flops=fl_base + fl_c1 + fl_c2)
    print(f"  -> the two cross attns + concats cost "
          f"{(t_full - t_base) * 1e3:.2f} ms in-context", flush=True)

    # cross-attn block tuning, in-loop
    for name, bq_, bkv_ in (("default", 1024, 1024), ("bq2048", 2048, 1024),
                            ("kv2048", 1024, 2048), ("bq2048/kv2048", 2048, 2048)):
        def full_step_t(x, a, b1=bq_, b2=bkv_):
            k_, v_, kv2, vv2, qv_ = a
            out = A.fused_flash_attention(x, k_, v_, tq, tk, heads=heads)
            c1 = A.fused_flash_attention(x, kv2, vv2, tq_tv, tk_vip,
                                         heads=heads, block_q=b1)
            vip_out = A.fused_flash_attention(
                qv_, jnp.concatenate([k_, kv2], axis=1),
                jnp.concatenate([v_, vv2], axis=1), tq_vip, vtk, heads=heads,
                block_kv=b2)
            return out + 0.6 * c1 + 0.0 * jnp.pad(
                vip_out, ((0, 0), (0, sq - s_vip), (0, 0)))

        t_t = loop_timed(f"full, cross blocks {name}", full_step_t, q,
                         (k, v, kv_, vv_, qv))
        print(f"  -> cross delta vs base: {(t_t - t_base) * 1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()


def pack_cost():
    """Isolate the XLA-side pack/unpack cost around the packed kernel: the
    wrapper's [B,S,H*D] -> [B,HP,S_p,2D] transposes + pad, and the output
    unpack, at the production shapes."""
    b = 1
    f, hp_, wp_ = 13, 30, 45
    s_text, s_vip = 226, 480
    sq = s_text + f * hp_ * wp_
    heads, d = 48, 64
    hd = heads * d
    hp = heads // 2
    sq_p = 18432
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, sq, hd), jnp.bfloat16)

    def pack(x, s, s_p):
        x = x.reshape(b, s, hp, 2 * d).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_p - s), (0, 0)))

    def roundtrip(x, a):
        xp = pack(x, sq, sq_p)
        return xp[:, :, :sq, :].transpose(0, 2, 1, 3).reshape(b, sq, hd)

    loop_timed("pack+unpack one 18k operand", roundtrip, q, ())

    def roundtrip3(x, a):
        xp = pack(x, sq, sq_p)
        kp = pack(x + 1, sq, sq_p)
        vp = pack(x + 2, sq, sq_p)
        y = (xp + kp + vp)[:, :, :sq, :]
        return y.transpose(0, 2, 1, 3).reshape(b, sq, hd)

    loop_timed("pack q,k,v + unpack out (base wrapper)", roundtrip3, q, ())

    qv = jax.random.normal(jax.random.PRNGKey(7), (b, s_vip, hd), jnp.bfloat16)

    def roundtrip_c2(x, a):
        kp = pack(x, sq, sq_p)  # 18k k
        vp = pack(x + 1, sq, sq_p)  # 18k v
        qp = jnp.pad(qv.reshape(b, s_vip, hp, 2 * d).transpose(0, 2, 1, 3),
                     ((0, 0), (0, 0), (0, 512 - s_vip), (0, 0)))
        y = qp + kp[:, :, :512] + vp[:, :, :512]
        return x + 0.0 * y[:, :, :1, :1].sum()

    loop_timed("cross2 wrapper packs (18k k+v, 480 q)", roundtrip_c2, q, ())


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "pack":
    pack_cost()
    sys.exit(0)

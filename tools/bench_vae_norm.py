"""Decide the VAE-decoder "megakernel" question with data (VERDICT r2 item 7).

The round-2 floor analysis showed decode is normalization-traffic-bound
(~50 of ~70 ms per 2-latent-frame tile call is GroupNorm/SpatialNorm+silu
chains at the top decoder level). The open question: is XLA's fused chain
already at the chip's achievable HBM bandwidth, or could a hand-scheduled
Pallas pass beat it?

Measures, at the top-level decode shape [T=8, 240, 360, 128] bf16:
  1. raw HBM copy (x + 1)                        -> achievable BW ceiling
  2. XLA GroupNorm(32 groups, f32 stats) + silu  -> the shipped chain
  3. Pallas fused two-sweep groupnorm+silu       -> the candidate kernel
  4. XLA chain fused into a 3x3 conv consumer    -> what the decoder actually
                                                    runs (stats + fused apply)

If (2)~(1) and (4) adds only conv time, the megakernel is dead — record the
numbers in PERF.md. If (2) is >=1.5x off the copy bound, integrate (3).
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


def _fetch(out):
    return [float(jnp.sum(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(out) if hasattr(x, "astype")]


def timed(name, fn, *args, iters=20, bytes_moved=None):
    _fetch(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0) / iters
    bw = f"  {bytes_moved / dt / 1e9:6.0f} GB/s" if bytes_moved else ""
    print(f"{name:48s} {dt * 1e3:8.2f} ms{bw}", flush=True)
    return dt


# Pallas fused groupnorm+silu: sweep 1 accumulates per-(frame,group) partial
# sums over row-tiles; sweep 2 normalizes + silu. Grid = (2 sweeps x T x HB).
def _gn_kernel(x_ref, g_ref, b_ref, o_ref, stat_scr, *, groups, hblk, eps):
    # stat_scr: [2, T, 128] per-frame (sum, sumsq) per group; grid is
    # phase-major so all frames' stats complete before any apply step
    phase = pl.program_id(0)
    t = pl.program_id(1)
    hb = pl.program_id(2)
    nhb = pl.num_programs(2)
    c = x_ref.shape[-1]
    gsz = c // groups

    @pl.when((phase == 0) & (t == 0) & (hb == 0))
    def _init():
        stat_scr[:] = jnp.zeros_like(stat_scr)

    @pl.when(phase == 0)
    def _stats():
        x = x_ref[0].astype(jnp.float32)  # [hblk, W, C]
        s = jnp.sum(x, axis=(0, 1))  # [C]
        s2 = jnp.sum(x * x, axis=(0, 1))
        sg = jnp.sum(s.reshape(groups, gsz), axis=1)  # [groups]
        s2g = jnp.sum(s2.reshape(groups, gsz), axis=1)
        stat_scr[0, t, :groups] += sg
        stat_scr[1, t, :groups] += s2g

    @pl.when(phase == 1)
    def _apply():
        x = x_ref[0].astype(jnp.float32)
        n = x.shape[0] * x.shape[1] * gsz * nhb
        mean = stat_scr[0, t, :groups] / n
        var = stat_scr[1, t, :groups] / n - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        meanc = jnp.repeat(mean, gsz)  # [C]
        invc = jnp.repeat(inv, gsz)
        y = (x - meanc[None, None, :]) * invc[None, None, :]
        y = y * g_ref[:] + b_ref[:]
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "hblk"))
def pallas_gn_silu(x, gamma, beta, groups=32, hblk=30):
    t, h, w, c = x.shape
    grid = (2, t, h // hblk)
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, hblk=hblk, eps=1e-6),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hblk, w, c), lambda p, t_, hb: (t_, hb, 0, 0)),
            pl.BlockSpec((c,), lambda p, t_, hb: (0,)),
            pl.BlockSpec((c,), lambda p, t_, hb: (0,)),
        ],
        out_specs=pl.BlockSpec((1, hblk, w, c), lambda p, t_, hb: (t_, hb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((2, x.shape[0], 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(x, gamma, beta)


def main():
    t, h, w, c = 8, 240, 360, 128
    groups = 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (t, h, w, c), jnp.bfloat16)
    gamma = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (c,))) + 0.5
    beta = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (c,))
    nbytes = x.size * 2

    timed("hbm copy (x+1)", jax.jit(lambda a: a + 1), x,
          bytes_moved=2 * nbytes)

    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=jnp.bfloat16)
    p = gn.init(key, x)

    def xla_chain(p_, a):
        return nn.silu(gn.apply(p_, a))

    timed("XLA GroupNorm(f32 stats)+silu", jax.jit(xla_chain), p, x,
          bytes_moved=3 * nbytes)  # stats read + apply read + write

    timed("Pallas fused 2-sweep gn+silu", lambda a: pallas_gn_silu(a, gamma, beta),
          x, bytes_moved=3 * nbytes)

    # numerics check
    ref = np.asarray(xla_chain(
        {"params": {"scale": gamma, "bias": beta}}, x).astype(jnp.float32))
    got = np.asarray(pallas_gn_silu(x, gamma, beta).astype(jnp.float32))
    print("pallas vs xla max |d|:", float(np.abs(ref - got).max()), flush=True)

    # the decoder's actual pattern: chain + 3x3 conv consumer
    kernel = jax.random.normal(jax.random.PRNGKey(3), (3, 3, c, c), jnp.bfloat16) * 0.05

    def xla_chain_conv(p_, a):
        y = nn.silu(gn.apply(p_, a))
        return jax.lax.conv_general_dilated(
            y.reshape(t, h, w, c), kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    conv_fl = 2 * t * h * w * 9 * c * c
    timed("XLA gn+silu+3x3conv (decoder pattern)", jax.jit(xla_chain_conv), p, x,
          bytes_moved=None)

    def conv_only(a):
        return jax.lax.conv_general_dilated(
            a, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt_conv = timed("3x3 conv alone", jax.jit(conv_only), x.reshape(t, h, w, c))
    print(f"conv flops: {conv_fl/dt_conv/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

"""Decide the VAE-decoder "megakernel" question with data (VERDICT r2 item 7).

The round-2 floor analysis showed decode is normalization-traffic-bound
(~50 of ~70 ms per 2-latent-frame tile call is GroupNorm/SpatialNorm+silu
chains at the top decoder level). The open question: is XLA's fused chain
already at the chip's achievable HBM bandwidth, or could a hand-scheduled
Pallas pass beat it?

Method: in-device `fori_loop` iteration (each iteration's output feeds the
next input) — per-dispatch tunnel overhead (~2 ms) otherwise swamps sub-ms
ops. At the top-level decode shape [T=8, 240, 360, 128] bf16:

  1. copy loop (x+1)           — 2 HBM passes/iter -> achievable BW ceiling
  2. GroupNorm(f32 stats)+silu — 3 passes/iter (stats R + apply R + W)
  3. gn+silu+3x3conv           — the decoder's real pattern
  4. 3x3 conv alone            — to separate the conv's share

If (2) ~ 1.5x (1) the chain is at bandwidth speed-of-light and a Pallas
megakernel has nothing left to win (a fused single-output kernel still needs
the same 3 passes; GroupNorm's global spatial stats force 2 sweeps, and the
whole [8,240,360,128] activation (177 MB) cannot stay VMEM-resident).

(A direct Pallas 2-sweep gn+silu was attempted and is recorded as a negative
result: Mosaic rejects the [C] -> [groups, C/groups] reduction reshape
("infer-vector-layout: unsupported shape cast"), and the arithmetic above
shows it could at best tie XLA.)
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

ITERS = 50


def loop_timed(name, fn, x, bytes_per_iter=None, flops=None):
    """Time fn iterated in-device: per-iteration output feeds the next input."""
    jitted = jax.jit(
        lambda x0: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x0))
    float(jnp.sum(jitted(x).astype(jnp.float32)))  # compile + warm
    t0 = time.time()
    out = jitted(x)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    extra = ""
    if bytes_per_iter:
        extra += f"  {bytes_per_iter / dt / 1e9:6.0f} GB/s"
    if flops:
        extra += f"  {flops / dt / 1e12:5.1f} TF/s"
    print(f"{name:44s} {dt * 1e3:8.3f} ms/iter{extra}", flush=True)
    return dt


def main():
    t, h, w, c = 8, 240, 360, 128
    groups = 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (t, h, w, c), jnp.bfloat16)
    nbytes = x.size * 2

    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=jnp.bfloat16)
    p = gn.init(key, x)
    kernel = jax.random.normal(jax.random.PRNGKey(3), (3, 3, c, c),
                               jnp.bfloat16) * 0.02

    def copy(a):
        return a + 1

    def chain(a):
        return nn.silu(gn.apply(p, a))

    def conv(a):
        return jax.lax.conv_general_dilated(
            a, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def chain_conv(a):
        return conv(nn.silu(gn.apply(p, a)))

    conv_fl = 2 * t * h * w * 9 * c * c
    t_copy = loop_timed("copy loop (x+1), 2 passes", copy, x,
                        bytes_per_iter=2 * nbytes)
    t_chain = loop_timed("GroupNorm(f32 stats)+silu, 3 passes", chain, x,
                         bytes_per_iter=3 * nbytes)
    t_conv = loop_timed("3x3 conv alone", conv, x, flops=conv_fl)
    t_cc = loop_timed("gn+silu+3x3conv (decoder pattern)", chain_conv, x,
                      flops=conv_fl)
    bw_eff = 3 * nbytes / t_chain / 1e9
    print(f"\nchain/copy ratio: {t_chain/t_copy:.2f} (pass-count ratio 1.5); "
          f"chain at {bw_eff:.0f} GB/s effective", flush=True)
    print(f"chain+conv vs conv alone: +{(t_cc-t_conv)*1e3:.2f} ms "
          f"(the chain's marginal cost when fused into a conv consumer)",
          flush=True)


if __name__ == "__main__":
    main()

"""T5-XXL prompt encode at scale on the chip (VERDICT r3 item 2).

Instantiates the REAL `T5Config.xxl` encoder (4.7B params, bf16 ~9.5 GB) with
random weights, encodes 226-token prompts, and reports ms/prompt + HBM — the
pipeline stage the reference runs at `pipeline_cogvideox_mp_fifo.py:365-486`
that had never been exercised at scale.

Usage: python tools/bench_t5_xxl.py [batch] [iters]
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

from tokensgen_tpu.models.t5 import T5Config, T5Encoder
from tokensgen_tpu.utils.params import init_params_bf16, param_count


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    seq = 226

    cfg = T5Config.xxl()
    model = T5Encoder(cfg)
    t0 = time.time()
    # init layer by layer on host then ship? init is elementwise random — do it
    # directly on device in bf16 (9.4 GB fits the 16 GB part)
    params = init_params_bf16(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, seq), jnp.int32), jnp.ones((1, seq), bool))
    n = param_count(params)
    print(f"[{time.time()-t0:7.1f}s] T5-XXL params: {n/1e9:.2f}B "
          f"({n*2/2**30:.1f} GiB bf16)", flush=True)

    fwd = jax.jit(lambda p, ids, mask: model.apply(p, ids, mask))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 32000, size=(batch, seq)), jnp.int32)
    mask = jnp.asarray(np.ones((batch, seq), bool))
    t1 = time.time()
    out = fwd(params, ids, mask)
    jax.block_until_ready(out)
    print(f"[{time.time()-t0:7.1f}s] compile+first encode: "
          f"{time.time()-t1:.1f}s; out {out.shape} {out.dtype}", flush=True)

    # one extra warm pass with a host readback: under the axon tunnel the
    # first post-compile block_until_ready can return before execution
    # finishes — the checksum transfer forces real completion
    _ = float(out.astype(jnp.float32).sum())

    times = []
    for i in range(iters):
        ids = jnp.asarray(rng.integers(3, 32000, size=(batch, seq)), jnp.int32)
        t1 = time.time()
        out = fwd(params, ids, mask)
        jax.block_until_ready(out)
        times.append(time.time() - t1)
    _ = float(out.astype(jnp.float32).sum())  # verify completion really happened
    times.sort()
    dt = times[len(times) // 2]
    # FLOPs: 2 * params * tokens (dense) + attention smallness ignored
    tf = 2 * n * batch * seq / dt / 1e12
    # at batch 1 the encode is weight-bandwidth-bound, so report that side too
    gbs = n * 2 / dt / 1e9
    print(f"T5-XXL encode: {dt*1000:.1f} ms / batch of {batch} "
          f"({dt*1000/batch:.1f} ms/prompt, {tf:.1f} TF/s, "
          f"{gbs:.0f} GB/s weight-stream)", flush=True)


if __name__ == "__main__":
    main()

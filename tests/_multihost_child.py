"""Child process for the multi-host test: 2 processes x 2 virtual CPU devices.

Runs one tiny To2V train step over a 4-way data mesh assembled from per-host
batches and prints the loss (must match across processes — same global batch,
psum'd grads).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])

    from tokensgen_tpu.sharding import (
        MeshSpec, initialize_multihost, make_mesh, process_batch_shard,
        replicate, shard_batch,
    )

    assert initialize_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    import jax.numpy as jnp

    from tokensgen_tpu.core import schedule as S
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    from tokensgen_tpu.models.dit import DiTConfig, VIPConfig
    from tokensgen_tpu.models.resampler import ResamplerConfig
    from tokensgen_tpu.train import to2v

    local_b, shard_idx, num_shards = process_batch_shard(4)
    assert (local_b, num_shards) == (2, 2) and shard_idx == pid

    vc = VIPConfig(length=2 * 2 * 3, output_dim=24, num_temporal_queries=2,
                   num_height_queries=2, num_width_queries=3)
    dcfg = DiTConfig.tiny(vip=vc)
    rcfg = ResamplerConfig.tiny(num_temporal_queries=2, num_height_queries=2,
                                num_width_queries=3, output_dim=24)
    f = 2
    h, w = dcfg.sample_height, dcfg.sample_width
    d = dcfg.attention_head_dim

    def local_slice(global_arr):
        return global_arr[pid * local_b:(pid + 1) * local_b]

    grng = np.random.default_rng(0)  # same global batch on both hosts, sliced
    batch = {
        "latents": local_slice(grng.normal(size=(4, f, 16, h, w))).astype(np.float32),
        "vip_input": local_slice(grng.normal(size=(4, 3, 4, rcfg.embedding_dim))).astype(np.float32),
        "text_embeds": local_slice(
            grng.normal(size=(4, dcfg.max_text_seq_length, dcfg.text_embed_dim))).astype(np.float32),
    }
    ropes = {
        "image_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(h // 2), np.arange(w // 2)),
        "vip_image_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(f) + 1000, np.arange(h // 2), np.arange(w // 2)),
        "vip_condition_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(2) + 1000, np.arange(2), np.arange(3)),
    }

    sched = S.make_schedule(S.ScheduleConfig())
    tcfg = to2v.To2VTrainConfig(num_processes=jax.device_count())
    init_batch = dict(batch, **ropes)
    params = to2v.init_params(dcfg, rcfg, jax.random.PRNGKey(0), init_batch)
    optimizer = to2v.make_optimizer(params, tcfg)
    opt_state = optimizer.init(params)
    step = jax.jit(to2v.make_train_step(dcfg, rcfg, sched, tcfg, optimizer))

    mesh = make_mesh(MeshSpec(data=jax.device_count()))
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    train_batch = dict(shard_batch(mesh, batch), **ropes)

    # AOT-compile, then rendezvous before executing: under load the two
    # processes' compile times can skew past Gloo's 30 s collective-setup
    # window — entering execution together keeps the psum rendezvous short.
    # The barrier is a plain filesystem one (both processes share a tmp dir,
    # argv[3]) — no private JAX APIs, no device collectives of its own.
    compiled = step.lower(params, opt_state, train_batch,
                          jax.random.PRNGKey(1)).compile()
    import time

    barrier_dir = sys.argv[3]
    with open(os.path.join(barrier_dir, f"compiled_{pid}"), "w"):
        pass
    deadline = time.monotonic() + 300
    while not all(
        os.path.exists(os.path.join(barrier_dir, f"compiled_{p}"))
        for p in range(2)
    ):
        if time.monotonic() > deadline:
            raise TimeoutError("peer never reached the compile barrier")
        time.sleep(0.05)
    _, _, metrics = compiled(params, opt_state, train_batch,
                             jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"MULTIHOST_LOSS {pid} {loss:.6f}", flush=True)


if __name__ == "__main__":
    main()

"""ZeRO-1 optimizer-state sharding: numerics identical to replicated state,
memory 1/N per device for shardable leaves (sharding/zero.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import DiTConfig, VIPConfig
from tokensgen_tpu.models.resampler import ResamplerConfig
from tokensgen_tpu.sharding import MeshSpec, make_mesh, replicate, shard_batch
from tokensgen_tpu.sharding.zero import (
    opt_state_shardings,
    shard_opt_state,
    sharded_bytes_per_device,
)
from tokensgen_tpu.train import to2v


def _setup():
    vc = VIPConfig(length=2 * 2 * 3, output_dim=24, num_temporal_queries=2,
                   num_height_queries=2, num_width_queries=3)
    dcfg = DiTConfig.tiny(vip=vc)
    rcfg = ResamplerConfig.tiny(num_temporal_queries=2, num_height_queries=2,
                                num_width_queries=3, output_dim=24)
    f, bsz = 2, 8
    h, w = dcfg.sample_height, dcfg.sample_width
    d = dcfg.attention_head_dim
    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.normal(size=(bsz, f, 16, h, w)), jnp.float32),
        "vip_input": jnp.asarray(rng.normal(size=(bsz, 3, 4, rcfg.embedding_dim)), jnp.float32),
        "text_embeds": jnp.asarray(
            rng.normal(size=(bsz, dcfg.max_text_seq_length, dcfg.text_embed_dim)), jnp.float32),
        "image_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(h // 2), np.arange(w // 2)),
        "vip_image_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(f) + 1000, np.arange(h // 2), np.arange(w // 2)),
        "vip_condition_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(2) + 1000, np.arange(2), np.arange(3)),
    }
    sched = S.make_schedule(S.ScheduleConfig())
    tcfg = to2v.To2VTrainConfig(num_processes=8)
    params = to2v.init_params(dcfg, rcfg, jax.random.PRNGKey(0), batch)
    optimizer = to2v.make_optimizer(params, tcfg)
    opt_state = optimizer.init(params)
    step = jax.jit(to2v.make_train_step(dcfg, rcfg, sched, tcfg, optimizer))
    return params, optimizer, opt_state, step, batch


def test_zero1_matches_replicated():
    mesh = make_mesh(MeshSpec(data=8))
    params, optimizer, opt_state, step, batch = _setup()

    params_r = replicate(mesh, params)
    for key in ("latents", "vip_input", "text_embeds"):
        batch[key] = shard_batch(mesh, batch[key])

    # replicated baseline
    p1, os1, m1 = step(params_r, replicate(mesh, opt_state), batch, jax.random.PRNGKey(1))
    # ZeRO-1 sharded state
    os_sharded = shard_opt_state(opt_state, mesh)
    p2, os2, m2 = step(params_r, os_sharded, batch, jax.random.PRNGKey(1))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))), p1, p2)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5

    # the big moment leaves actually live sharded
    specs = opt_state_shardings(opt_state, mesh)
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: hasattr(x, "spec")) if s.spec != P())
    assert n_sharded > 0
    full = sum(int(np.prod(x.shape or (1,))) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(opt_state)
               if hasattr(x, "shape"))
    per_dev = sharded_bytes_per_device(opt_state, mesh)
    assert per_dev < full  # strictly less than replicated

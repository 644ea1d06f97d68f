"""To2V train step: vip+resampler params update, base DiT frozen, loss finite.
Also exercises the data-parallel pjit path on the 8-device CPU mesh."""

import flax
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import DiTConfig, VIPConfig
from tokensgen_tpu.models.resampler import ResamplerConfig
from tokensgen_tpu.train import to2v


def _setup(batch_size=2):
    vc = VIPConfig(length=2 * 2 * 3, output_dim=24, num_temporal_queries=2,
                   num_height_queries=2, num_width_queries=3)
    dcfg = DiTConfig.tiny(vip=vc)
    rcfg = ResamplerConfig.tiny(num_temporal_queries=2, num_height_queries=2,
                                num_width_queries=3, output_dim=24)
    f = 3
    h, w = dcfg.sample_height, dcfg.sample_width
    hp, wp = h // 2, w // 2
    rng = np.random.default_rng(0)
    d = dcfg.attention_head_dim
    batch = {
        "latents": jnp.asarray(rng.normal(size=(batch_size, f, 16, h, w)), jnp.float32),
        "vip_input": jnp.asarray(rng.normal(size=(batch_size, 3, 4, rcfg.embedding_dim)), jnp.float32),
        "text_embeds": jnp.asarray(
            rng.normal(size=(batch_size, dcfg.max_text_seq_length, dcfg.text_embed_dim)), jnp.float32),
        "image_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp), np.arange(wp)),
        "vip_image_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(f) + 1000, np.arange(hp), np.arange(wp)),
        "vip_condition_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(2) + 1000, np.arange(2), np.arange(3)),
    }
    sched = S.make_schedule(S.ScheduleConfig())
    tcfg = to2v.To2VTrainConfig()
    params = to2v.init_params(dcfg, rcfg, jax.random.PRNGKey(0), batch)
    optimizer = to2v.make_optimizer(params, tcfg)
    step = to2v.make_train_step(dcfg, rcfg, sched, tcfg, optimizer)
    return params, optimizer, step, batch


def test_one_step_updates_only_trainable():
    params, optimizer, step, batch = _setup()
    opt_state = optimizer.init(params)
    step_jit = jax.jit(step)
    new_params, opt_state, metrics = step_jit(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0

    old = flax.traverse_util.flatten_dict(params)
    new = flax.traverse_util.flatten_dict(new_params)
    labels = flax.traverse_util.flatten_dict(to2v.trainable_labels(params))
    changed_train, changed_freeze, n_train = 0, 0, 0
    for key in old:
        same = np.allclose(np.asarray(old[key]), np.asarray(new[key]))
        if labels[key] == "train":
            n_train += 1
            changed_train += 0 if same else 1
        else:
            changed_freeze += 0 if same else 1
    assert changed_freeze == 0, "frozen base params must not move"
    assert changed_train > n_train // 2, "most vip/resampler params should update"


def test_trainable_label_coverage():
    params, *_ = _setup()
    labels = flax.traverse_util.flatten_dict(to2v.trainable_labels(params))
    paths = {"/".join(map(str, k)): v for k, v in labels.items()}
    assert any(v == "train" and "vip_to_q" in k for k, v in paths.items())
    assert any(v == "train" and k.startswith("resampler/") for k, v in paths.items())
    assert any(v == "train" and "vip_proj" in k for k, v in paths.items())
    assert all(
        v == "freeze"
        for k, v in paths.items()
        if k.startswith("dit/") and "/to_q/" in k and "vip" not in k
    )


def test_data_parallel_step_on_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tokensgen_tpu.sharding import make_mesh, MeshSpec, shard_batch, replicate

    params, optimizer, step, batch = _setup(batch_size=8)
    mesh = make_mesh(MeshSpec(data=8))
    opt_state = optimizer.init(params)

    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    sharded = dict(batch)
    for key in ("latents", "vip_input", "text_embeds"):
        sharded[key] = shard_batch(mesh, batch[key])

    step_jit = jax.jit(step)
    new_params, _, metrics = step_jit(params, opt_state, sharded, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_cast_frozen_bf16_trains():
    """bf16 frozen / f32 trainable storage (the 5b memory scheme): the train
    step runs, loss finite, trainable leaves stay f32, frozen become bf16."""
    import flax
    import jax.numpy as jnp

    from tokensgen_tpu.train import to2v as T

    vc = VIPConfig(length=2 * 2 * 3, output_dim=24, num_temporal_queries=2,
                   num_height_queries=2, num_width_queries=3)
    dcfg = DiTConfig.tiny(vip=vc)
    rcfg = ResamplerConfig.tiny(num_temporal_queries=2, num_height_queries=2,
                                num_width_queries=3, output_dim=24)
    f = 3
    h, w = dcfg.sample_height, dcfg.sample_width
    hp, wp = h // 2, w // 2
    rng0 = np.random.default_rng(0)
    d = dcfg.attention_head_dim
    batch = {
        "latents": jnp.asarray(rng0.normal(size=(2, f, 16, h, w)), jnp.float32),
        "vip_input": jnp.asarray(rng0.normal(size=(2, 3, 4, rcfg.embedding_dim)), jnp.float32),
        "text_embeds": jnp.asarray(
            rng0.normal(size=(2, dcfg.max_text_seq_length, dcfg.text_embed_dim)), jnp.float32),
        "image_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp), np.arange(wp)),
        "vip_image_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(f) + 1000, np.arange(hp), np.arange(wp)),
        "vip_condition_rotary_emb": get_3d_rotary_pos_embed_v2(d, np.arange(2) + 1000, np.arange(2), np.arange(3)),
    }
    sched = S.make_schedule(S.ScheduleConfig())
    tcfg = T.To2VTrainConfig()
    params = T.init_params(dcfg, rcfg, jax.random.PRNGKey(0), batch)
    params = T.cast_frozen_bf16(params)
    labels = flax.traverse_util.flatten_dict(T.trainable_labels(params))
    for k, v in flax.traverse_util.flatten_dict(params).items():
        if labels[k] == "freeze":
            assert v.dtype == jnp.bfloat16, k
        else:
            assert v.dtype == jnp.float32, k
    optimizer = T.make_optimizer(params, tcfg)
    opt_state = optimizer.init(params)
    step = jax.jit(T.make_train_step(dcfg, rcfg, sched, tcfg, optimizer))
    new_params, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # frozen leaves unchanged, some trainable leaf moved
    flat0 = flax.traverse_util.flatten_dict(params)
    flat1 = flax.traverse_util.flatten_dict(new_params)
    moved = False
    for k in flat0:
        if labels[k] == "freeze":
            np.testing.assert_array_equal(np.asarray(flat0[k]), np.asarray(flat1[k]))
        elif not np.allclose(np.asarray(flat0[k]), np.asarray(flat1[k])):
            moved = True
    assert moved

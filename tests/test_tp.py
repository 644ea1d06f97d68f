"""Tensor-parallel DiT: sharded params produce identical outputs on a model-axis
mesh (XLA inserts the row-parallel all-reduces)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
from tokensgen_tpu.sharding import MeshSpec, make_mesh
from tokensgen_tpu.sharding.tp import dit_param_specs, shard_dit_params


def test_param_specs_shapes():
    cfg = DiTConfig.tiny()
    model = CogVideoXTransformer(cfg)
    rng = np.random.default_rng(0)
    f, hp, wp = 2, cfg.sample_height // 2, cfg.sample_width // 2
    x = jnp.zeros((1, f, 16, cfg.sample_height, cfg.sample_width))
    text = jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim))
    rope = get_3d_rotary_pos_embed_v2(cfg.attention_head_dim, np.arange(f), np.arange(hp), np.arange(wp))
    params = model.init(jax.random.PRNGKey(0), x, text, jnp.zeros((1,), jnp.int32),
                        image_rotary_emb=rope)["params"]
    import flax
    specs = flax.traverse_util.flatten_dict(dit_param_specs(params))
    # scan-stacked attn kernels: [L, in, out] -> (None, None, 'model')
    assert specs[("blocks", "attn1", "to_q", "kernel")] == P(None, None, "model")
    assert specs[("blocks", "attn1", "to_out", "kernel")] == P(None, "model", None)
    assert specs[("blocks", "ff", "net_0_proj", "kernel")] == P(None, None, "model")
    assert specs[("blocks", "ff", "net_2", "kernel")] == P(None, "model", None)
    assert specs[("blocks", "norm1", "linear", "kernel")] == P()


def test_tp_forward_matches_replicated():
    cfg = DiTConfig.tiny()  # 2 heads -> shardable over model=2
    model = CogVideoXTransformer(cfg)
    rng = np.random.default_rng(1)
    f, hp, wp = 2, cfg.sample_height // 2, cfg.sample_width // 2
    x = jnp.asarray(rng.normal(size=(1, f, 16, cfg.sample_height, cfg.sample_width)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32)
    t = jnp.asarray([500])
    rope = get_3d_rotary_pos_embed_v2(cfg.attention_head_dim, np.arange(f), np.arange(hp), np.arange(wp))
    params = model.init(jax.random.PRNGKey(0), x, text, t, image_rotary_emb=rope)["params"]

    ref = model.apply({"params": params}, x, text, t, image_rotary_emb=rope)

    mesh = make_mesh(MeshSpec(data=1, queue=1, model=2))
    with mesh:
        sharded = shard_dit_params(mesh, params)
        fwd = jax.jit(lambda p: model.apply({"params": p}, x, text, t,
                                            image_rotary_emb=rope))
        out = fwd(sharded)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5)


def test_tp_forward_shard_mapped_attention():
    """tp_axis set: the attention op shard_maps itself over heads (the TPU path
    where the Pallas custom call cannot auto-partition) — output must still
    match the replicated forward, and with VIP enabled."""
    from tokensgen_tpu.models.dit import VIPConfig

    vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=4,
                   num_width_queries=6, length=2 * 4 * 6)
    cfg = DiTConfig.tiny(vip=vc)
    model = CogVideoXTransformer(cfg)
    model_tp = CogVideoXTransformer(DiTConfig.tiny(vip=vc, tp_axis="model"))
    rng = np.random.default_rng(2)
    f, hp, wp = 2, cfg.sample_height // 2, cfg.sample_width // 2
    d = cfg.attention_head_dim
    x = jnp.asarray(rng.normal(size=(1, f, 16, cfg.sample_height, cfg.sample_width)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32)
    vip = jnp.asarray(rng.normal(size=(1, 2, 24, 4, 6)), jnp.float32)
    t = jnp.asarray([500])
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp), np.arange(wp))
    cond_rope = get_3d_rotary_pos_embed_v2(d, np.arange(2), np.arange(4), np.arange(6))
    kw = dict(image_rotary_emb=rope, vip_hidden_states=vip,
              vip_image_rotary_emb=rope, vip_condition_rotary_emb=cond_rope)
    params = model.init(jax.random.PRNGKey(0), x, text, t, **kw)["params"]

    ref = model.apply({"params": params}, x, text, t, **kw)

    mesh = make_mesh(MeshSpec(data=1, queue=1, model=2))
    with jax.set_mesh(mesh):
        sharded = shard_dit_params(mesh, params)
        out = jax.jit(lambda p: model_tp.apply({"params": p}, x, text, t, **kw))(sharded)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5)

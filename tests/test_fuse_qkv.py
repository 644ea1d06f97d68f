"""Fused-QKV projection path: identical outputs after param fusion."""

import numpy as np
import jax
import jax.numpy as jnp

from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import (
    CogVideoXTransformer, DiTConfig, fuse_qkv_params, unfuse_qkv_params,
)


def test_fused_matches_unfused():
    cfg = DiTConfig.tiny()
    cfg_f = DiTConfig.tiny(fuse_qkv=True)
    rng = np.random.default_rng(0)
    f = 2
    hp, wp = cfg.sample_height // 2, cfg.sample_width // 2
    x = jnp.asarray(rng.normal(size=(1, f, 16, cfg.sample_height, cfg.sample_width)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32)
    t = jnp.asarray([500])
    rope = get_3d_rotary_pos_embed_v2(cfg.attention_head_dim, np.arange(f), np.arange(hp), np.arange(wp))

    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t, image_rotary_emb=rope)["params"]
    out = model.apply({"params": params}, x, text, t, image_rotary_emb=rope)

    fused = fuse_qkv_params(params)
    model_f = CogVideoXTransformer(cfg_f)
    out_f = model_f.apply({"params": fused}, x, text, t, image_rotary_emb=rope)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_f), rtol=1e-5, atol=1e-5)

    # roundtrip back
    back = unfuse_qkv_params(fused)
    out_b = model.apply({"params": back}, x, text, t, image_rotary_emb=rope)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_b), rtol=1e-6)


def test_graft_vip_on_fused_qkv():
    """graft_vip_params splits a fused to_qkv into the vip projections — a
    fused-QKV VIP model grafts identically to the unfused one."""
    from tokensgen_tpu.models.dit import VIPConfig, graft_vip_params
    import flax

    vc = VIPConfig(length=2 * 2 * 3, output_dim=24, num_temporal_queries=2,
                   num_height_queries=2, num_width_queries=3)
    cfg = DiTConfig.tiny(vip=vc)
    # fuse_vip_qkv=True covers the fully-fused layout (the shipped default
    # keeps vip unfused — measured slower on v5e, see DiTConfig)
    cfg_f = DiTConfig.tiny(vip=vc, fuse_qkv=True, fuse_vip_qkv=True)
    rng = np.random.default_rng(1)
    f = 2
    hp, wp = cfg.sample_height // 2, cfg.sample_width // 2
    d = cfg.attention_head_dim
    x = jnp.asarray(rng.normal(size=(1, f, 16, cfg.sample_height,
                                     cfg.sample_width)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, cfg.max_text_seq_length,
                                        cfg.text_embed_dim)), jnp.float32)
    t = jnp.asarray([500])
    vip_tokens = jnp.asarray(
        rng.normal(size=(1, 2, cfg.inner_dim, 2, 3)), jnp.float32)
    kwargs = dict(
        image_rotary_emb=get_3d_rotary_pos_embed_v2(
            d, np.arange(f), np.arange(hp), np.arange(wp)),
        vip_image_rotary_emb=get_3d_rotary_pos_embed_v2(
            d, np.arange(f) + 1000, np.arange(hp), np.arange(wp)),
        vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(
            d, np.arange(2) + 1000, np.arange(2), np.arange(3)),
    )

    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t,
                        vip_hidden_states=vip_tokens, **kwargs)["params"]
    grafted = graft_vip_params(params, cfg)
    out = model.apply({"params": grafted}, x, text, t,
                      vip_hidden_states=vip_tokens, **kwargs)

    fused = fuse_qkv_params(params, fuse_vip=True)
    grafted_f = graft_vip_params(fused, cfg_f)
    # the vip branch fuses too: vip_to_qkv == concat(vip_to_q, vip_to_k,
    # vip_to_v) of the unfused graft
    flat = flax.traverse_util.flatten_dict(grafted_f)
    flat_u = flax.traverse_util.flatten_dict(grafted)
    for key, val in flat.items():
        if "vip_to_qkv" in key:
            parts = [flat_u[tuple(n if k == "vip_to_qkv" else k for k in key)]
                     for n in ("vip_to_q", "vip_to_k", "vip_to_v")]
            np.testing.assert_array_equal(
                np.asarray(val), np.concatenate([np.asarray(p) for p in parts],
                                                axis=-1))
    assert any("vip_to_qkv" in k for k in flat), "vip projections not fused"
    model_f = CogVideoXTransformer(cfg_f)
    out_f = model_f.apply({"params": grafted_f}, x, text, t,
                          vip_hidden_states=vip_tokens, **kwargs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_f),
                               rtol=1e-5, atol=1e-5)

    # the SHIPPED layout: base fused, vip unfused (fuse_vip_qkv default)
    cfg_s = DiTConfig.tiny(vip=vc, fuse_qkv=True)
    grafted_s = graft_vip_params(fuse_qkv_params(params), cfg_s)
    out_s = CogVideoXTransformer(cfg_s).apply(
        {"params": grafted_s}, x, text, t,
        vip_hidden_states=vip_tokens, **kwargs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)

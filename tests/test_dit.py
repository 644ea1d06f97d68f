"""DiT forward tests on the tiny debug config (SURVEY §4 test pyramid, item 3)."""

import numpy as np
import jax
import jax.numpy as jnp

from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig, VIPConfig, graft_vip_params


def _make_inputs(cfg, rng, f=3, vip_frames=2):
    b = 2
    h, w = cfg.sample_height, cfg.sample_width
    x = jnp.asarray(rng.normal(size=(b, f, cfg.in_channels, h, w)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(b, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32)
    t = jnp.asarray([500, 400])
    d = cfg.attention_head_dim
    hp, wp = h // cfg.patch_size, w // cfg.patch_size
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp), np.arange(wp))
    extras = {}
    if cfg.vip is not None:
        vc = cfg.vip
        vip_tokens = jnp.asarray(
            rng.normal(size=(b, vip_frames, vc.output_dim, vc.num_height_queries, vc.num_width_queries)),
            jnp.float32,
        )
        vip_img_rope = get_3d_rotary_pos_embed_v2(d, np.arange(f) + 1000, np.arange(hp), np.arange(wp))
        vip_cond_rope = get_3d_rotary_pos_embed_v2(
            d, np.arange(vip_frames) + 1000,
            np.arange(vc.num_height_queries), np.arange(vc.num_width_queries),
        )
        extras = dict(
            vip_hidden_states=vip_tokens,
            vip_image_rotary_emb=vip_img_rope,
            vip_condition_rotary_emb=vip_cond_rope,
        )
    return x, text, t, rope, extras


def test_forward_shape_base():
    cfg = DiTConfig.tiny()
    rng = np.random.default_rng(0)
    x, text, t, rope, _ = _make_inputs(cfg, rng)
    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t, image_rotary_emb=rope)
    out = model.apply(params, x, text, t, image_rotary_emb=rope)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_forward_with_vip_branch():
    vc = VIPConfig(length=2 * 4 * 6, output_dim=24, num_temporal_queries=2,
                   num_height_queries=4, num_width_queries=6)
    cfg = DiTConfig.tiny(vip=vc)
    rng = np.random.default_rng(1)
    x, text, t, rope, extras = _make_inputs(cfg, rng, vip_frames=2)
    # fix vip spatial grid to match tiny config
    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t, image_rotary_emb=rope, **extras)
    out = model.apply(params, x, text, t, image_rotary_emb=rope, **extras)
    assert out.shape == x.shape
    # vip tokens must influence the output
    extras2 = dict(extras)
    extras2["vip_hidden_states"] = extras["vip_hidden_states"] + 1.0
    out2 = model.apply(params, x, text, t, image_rotary_emb=rope, **extras2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_per_frame_timesteps():
    cfg = DiTConfig.tiny()
    rng = np.random.default_rng(2)
    x, text, _, rope, _ = _make_inputs(cfg, rng)
    model = CogVideoXTransformer(cfg)
    t_uniform = jnp.full((2, 3), 500)
    t_ramp = jnp.asarray([[500, 400, 300], [500, 400, 300]])
    params = model.init(jax.random.PRNGKey(0), x, text, t_uniform, image_rotary_emb=rope)
    out_u = model.apply(params, x, text, t_uniform, image_rotary_emb=rope)
    out_r = model.apply(params, x, text, t_ramp, image_rotary_emb=rope)
    # frame 0 shares its timestep between the two runs BUT attends to different
    # frames, so only check the ramp produces different results overall
    assert not np.allclose(np.asarray(out_u), np.asarray(out_r))
    # scalar-per-batch [B] and [B, 1] must agree
    out_b = model.apply(params, x, text, jnp.asarray([500, 500]), image_rotary_emb=rope)
    out_b1 = model.apply(params, x, text, jnp.full((2, 1), 500), image_rotary_emb=rope)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_b1), rtol=1e-5)


def test_t2to_raw_token_mode():
    cfg = DiTConfig.tiny(patch_size=1, use_output_projection=False,
                         sample_height=4, sample_width=6)
    rng = np.random.default_rng(3)
    b, f = 1, 8
    x = jnp.asarray(rng.normal(size=(b, f, 16, 4, 6)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(b, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32)
    t = jnp.asarray([700])
    rope = get_3d_rotary_pos_embed_v2(
        cfg.attention_head_dim, np.arange(f), np.arange(4), np.arange(6),
        dim_t=8, dim_h=4, dim_w=4,
    )
    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t, image_rotary_emb=rope)
    out = model.apply(params, x, text, t, image_rotary_emb=rope)
    assert out.shape == (b, f, cfg.inner_dim, 4, 6)


def test_non_rotary_positional_path():
    cfg = DiTConfig.tiny(use_rotary_positional_embeddings=False)
    rng = np.random.default_rng(4)
    x, text, t, _, _ = _make_inputs(cfg, rng)
    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t)
    out = model.apply(params, x, text, t)
    assert out.shape == x.shape


def test_graft_vip_params():
    import flax
    vc = VIPConfig(length=2 * 4 * 6, output_dim=24, num_temporal_queries=2,
                   num_height_queries=4, num_width_queries=6)
    cfg = DiTConfig.tiny(vip=vc)
    rng = np.random.default_rng(5)
    x, text, t, rope, extras = _make_inputs(cfg, rng, vip_frames=2)
    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t, image_rotary_emb=rope, **extras)
    grafted = graft_vip_params(params, cfg)
    flat = flax.traverse_util.flatten_dict(grafted)
    pairs = 0
    for key, val in flat.items():
        if "vip_to_q" in key:
            base_key = tuple("to_q" if k == "vip_to_q" else k for k in key)
            np.testing.assert_array_equal(np.asarray(val), np.asarray(flat[base_key]))
            pairs += 1
    assert pairs > 0

"""VIP func_type "4" (autoregressive context branch) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig, VIPConfig


def _setup():
    f, f_ar = 4, 2
    cfg0 = DiTConfig.tiny()
    hp, wp = cfg0.sample_height // 2, cfg0.sample_width // 2
    hw = hp * wp
    vc = VIPConfig(func_type="4", ar_length=f_ar * hw, scale_ar=0.5,
                   output_dim=24, num_temporal_queries=2, num_height_queries=4,
                   num_width_queries=6, length=2 * 4 * 6)
    cfg = DiTConfig.tiny(vip=vc)
    d = cfg.attention_head_dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, f, 16, cfg.sample_height, cfg.sample_width)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32)
    t = jnp.asarray([500])
    # base rope only covers the non-ar frames; vip-image rope covers all frames
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f - f_ar), np.arange(hp), np.arange(wp))
    vip_img_rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp), np.arange(wp))
    cond_rope = get_3d_rotary_pos_embed_v2(d, np.arange(2), np.arange(4), np.arange(6))
    vip_tokens = jnp.asarray(rng.normal(size=(1, 2, 24, 4, 6)), jnp.float32)
    kw = dict(vip_hidden_states=vip_tokens, image_rotary_emb=rope,
              vip_image_rotary_emb=vip_img_rope, vip_condition_rotary_emb=cond_rope)
    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t, **kw)
    return cfg, model, params, x, text, t, kw, f, f_ar


def test_v4_output_drops_ar_frames():
    cfg, model, params, x, text, t, kw, f, f_ar = _setup()
    out = model.apply(params, x, text, t, **kw)
    assert out.shape == (1, f - f_ar, 16, cfg.sample_height, cfg.sample_width)
    assert np.isfinite(np.asarray(out)).all()


def test_v4_ar_context_conditions_output():
    cfg, model, params, x, text, t, kw, f, f_ar = _setup()
    out = np.asarray(model.apply(params, x, text, t, **kw))
    x2 = np.asarray(x).copy()
    x2[:, :f_ar] += 1.0  # perturb only the ar context frames
    out2 = np.asarray(model.apply(params, jnp.asarray(x2), text, t, **kw))
    assert not np.allclose(out, out2)


def test_v4_has_ar_norm_params():
    import flax
    cfg, model, params, *_ = _setup()
    paths = {"/".join(map(str, k)) for k in flax.traverse_util.flatten_dict(params["params"])}
    assert any("ar_norm1" in p for p in paths)
    assert any("ar_norm2" in p for p in paths)

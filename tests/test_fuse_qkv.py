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

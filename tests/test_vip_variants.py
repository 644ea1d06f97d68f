"""VIP processor variants (func_type 1/2/3) behavioral tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig, VIPConfig


def _run(func_type, seed=0):
    vc = VIPConfig(func_type=func_type, output_dim=24, num_temporal_queries=2,
                   num_height_queries=4, num_width_queries=6, length=2 * 4 * 6)
    cfg = DiTConfig.tiny(vip=vc)
    rng = np.random.default_rng(seed)
    f = 2
    hp, wp = cfg.sample_height // 2, cfg.sample_width // 2
    d = cfg.attention_head_dim
    x = jnp.asarray(rng.normal(size=(1, f, 16, cfg.sample_height, cfg.sample_width)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32)
    t = jnp.asarray([500])
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp), np.arange(wp))
    vip_tokens = jnp.asarray(rng.normal(size=(1, 2, 24, 4, 6)), jnp.float32)
    cond_rope = get_3d_rotary_pos_embed_v2(d, np.arange(2), np.arange(4), np.arange(6))
    model = CogVideoXTransformer(cfg)
    kw = dict(vip_hidden_states=vip_tokens, image_rotary_emb=rope,
              vip_image_rotary_emb=rope, vip_condition_rotary_emb=cond_rope)
    params = model.init(jax.random.PRNGKey(0), x, text, t, **kw)
    out = model.apply(params, x, text, t, **kw)
    out2 = model.apply(params, x, text, t, **{**kw, "vip_hidden_states": vip_tokens + 1.0})
    return np.asarray(out), np.asarray(out2), params


@pytest.mark.parametrize("func_type", ["1", "2", "3"])
def test_variants_run_and_condition(func_type):
    out, out_shifted, _ = _run(func_type)
    assert np.isfinite(out).all()
    # vip tokens influence the video output in every variant
    assert not np.allclose(out, out_shifted)


def test_variants_differ():
    outs = {ft: _run(ft)[0] for ft in ("1", "2", "3")}
    assert not np.allclose(outs["1"], outs["2"])
    assert not np.allclose(outs["2"], outs["3"])


def test_v3_has_no_vip_norm_params():
    import flax

    _, _, params = _run("3")
    paths = {"/".join(map(str, k)) for k in flax.traverse_util.flatten_dict(params["params"])}
    assert not any("vip_norm1" in p for p in paths)
    assert any("vip_to_q" in p for p in paths)  # projections still exist

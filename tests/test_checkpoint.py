import numpy as np
import jax.numpy as jnp

from tokensgen_tpu.train import checkpoint as CK


def _state(v):
    return {
        "params": {"w": jnp.full((2, 2), float(v)), "b": jnp.zeros((2,))},
        "step": jnp.asarray(v),
    }


def test_save_restore_roundtrip(tmp_path):
    root = str(tmp_path / "ckpts")
    CK.save_checkpoint(root, 10, _state(1))
    CK.save_checkpoint(root, 20, _state(2))
    state, step = CK.restore_checkpoint(root)
    assert step == 20
    np.testing.assert_allclose(np.asarray(state["params"]["w"]), 2.0)
    state, step = CK.restore_checkpoint(root, step=10)
    np.testing.assert_allclose(np.asarray(state["params"]["w"]), 1.0)


def test_rotation(tmp_path):
    root = str(tmp_path / "ckpts")
    for s in (1, 2, 3, 4):
        CK.save_checkpoint(root, s, _state(s), total_limit=2)
    assert CK.list_checkpoints(root) == [3, 4]


def test_restore_empty(tmp_path):
    state, step = CK.restore_checkpoint(str(tmp_path / "none"))
    assert state is None and step is None


def test_export_reference_artifacts(tmp_path):
    import jax
    from tokensgen_tpu.convert.safetensors_io import load_safetensors
    from tokensgen_tpu.core import pca as P
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig, VIPConfig
    from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig

    vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=4,
                   num_width_queries=6, length=2 * 4 * 6)
    cfg = DiTConfig.tiny(vip=vc)
    model = CogVideoXTransformer(cfg)
    d = cfg.attention_head_dim
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(2), np.arange(4), np.arange(8))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 16, cfg.sample_height, cfg.sample_width)),
        jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32),
        vip_hidden_states=jnp.zeros((1, 2, 24, 4, 6)),
        image_rotary_emb=rope,
        vip_image_rotary_emb=rope,
        vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(d, np.arange(2), np.arange(4), np.arange(6)),
    )["params"]
    rcfg = ResamplerConfig.tiny()
    rs_params = Resampler(rcfg).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 2, 6, rcfg.embedding_dim))
    )["params"]
    pca = P.fit(jnp.asarray(np.random.default_rng(0).normal(size=(50, 24))), 8)

    out = str(tmp_path / "artifacts")
    CK.export_reference_artifacts(
        out, dit_params=params, dit_config=cfg,
        resampler_params=rs_params, resampler_depth=rcfg.depth,
        pca=pca, token_mean=np.zeros((1, 24)), token_std=np.ones((1, 24)),
    )
    vip_sd = load_safetensors(f"{out}/vip.safetensors")
    assert all("vip_" in k for k in vip_sd)
    rs_sd = load_safetensors(f"{out}/resampler/diffusion_flax_model.safetensors")
    assert "latents" in rs_sd
    pca_sd = load_safetensors(f"{out}/pca.safetensors")
    assert pca_sd["components_"].shape == (8, 24)

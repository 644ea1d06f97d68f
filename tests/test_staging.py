"""To2V training batch staging tests (windowing, vip selection, per-sample ropes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokensgen_tpu.models.dit import DiTConfig, VIPConfig
from tokensgen_tpu.models.resampler import ResamplerConfig
from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner
from tokensgen_tpu.train import staging


@pytest.fixture(scope="module")
def setup():
    vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=2,
                   num_width_queries=3, length=3 * 2 * 3)
    dcfg = DiTConfig.tiny(vip=vc, sample_height=4, sample_width=6)
    rcfg = ResamplerConfig.tiny(embedding_dim=dcfg.inner_dim, output_dim=24,
                                num_temporal_queries=2, num_height_queries=2,
                                num_width_queries=3)
    vcfg = VAEConfig.tiny(sample_height=32, sample_width=48)
    vae_model = AutoencoderKLCogVideoX(vcfg)
    vae_params = vae_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 32, 48, 3)))
    vae = VAERunner(vcfg, vae_params)

    # a patch_proj params tree (conv kernel) from a dit init
    from tokensgen_tpu.models.dit import CogVideoXTransformer
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    d = dcfg.attention_head_dim
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(3), np.arange(2), np.arange(3))
    dit = CogVideoXTransformer(dcfg)
    dit_params = dit.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 3, 16, 4, 6)),
        jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32),
        vip_hidden_states=jnp.zeros((1, 3, 24, 2, 3)),
        image_rotary_emb=rope, vip_image_rotary_emb=rope,
        vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(d, np.arange(3), np.arange(2), np.arange(3)),
    )["params"]
    return dcfg, rcfg, vae, dit_params


def test_stage_batch_shapes(setup):
    dcfg, rcfg, vae, dit_params = setup
    rng = np.random.default_rng(0)
    b, chunks, nf_px = 2, 2, 9
    pixels = jnp.asarray(rng.uniform(-1, 1, size=(b, chunks * nf_px, 32, 48, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(b, dcfg.max_text_seq_length, dcfg.text_embed_dim)), jnp.float32)
    out = staging.stage_to2v_batch(
        dcfg, dit_params, rcfg, vae, pixels,
        start_frame_idx=np.asarray([0, 7]),
        drop_image_embed=np.asarray([0, 1]),
        text_embeds=text, rng=jax.random.PRNGKey(0), nf_px=nf_px,
        host_rng=np.random.default_rng(1),
    )
    nf = 3
    assert out["latents"].shape == (b, nf, 16, 4, 6)
    # per-chunk patch tokens: [B, C, nf, N=2*3, inner]
    assert out["vip_input_chunks"].shape == (b, chunks, nf, 6, dcfg.inner_dim)
    assert out["vip_emb_sel"].shape == (b, 3)  # n_vip = min(vq+1, nf) = 3
    # per-sample batched ropes
    cos, sin = out["vip_image_rotary_emb"]
    assert cos.shape[0] == b and cos.shape[1] == nf * 2 * 3
    ccos, _ = out["vip_condition_rotary_emb"]
    assert ccos.shape[0] == b and ccos.shape[1] == 3 * 2 * 3
    assert (np.asarray(out["relative_start_idx"]) <= nf * chunks - nf).all()


def test_drop_image_embed_zeroes_conditioning(setup):
    """Sample 1 has drop_image_embed=1 -> its vip tokens equal those of a
    zeros-video regardless of content."""
    dcfg, rcfg, vae, dit_params = setup
    rng = np.random.default_rng(2)
    b, chunks, nf_px = 2, 2, 9
    pixels = np.asarray(rng.uniform(-1, 1, size=(b, chunks * nf_px, 32, 48, 3)), np.float32)
    text = jnp.zeros((b, dcfg.max_text_seq_length, dcfg.text_embed_dim))

    out1 = staging.stage_to2v_batch(
        dcfg, dit_params, rcfg, vae, jnp.asarray(pixels),
        np.asarray([0, 0]), np.asarray([0, 1]), text,
        jax.random.PRNGKey(0), nf_px=nf_px, host_rng=np.random.default_rng(3))
    pixels2 = pixels.copy()
    pixels2[1] = rng.uniform(-1, 1, size=pixels[1].shape)  # different content
    out2 = staging.stage_to2v_batch(
        dcfg, dit_params, rcfg, vae, jnp.asarray(pixels2),
        np.asarray([0, 0]), np.asarray([0, 1]), text,
        jax.random.PRNGKey(0), nf_px=nf_px, host_rng=np.random.default_rng(3))
    # dropped sample's conditioning tokens identical despite different video
    np.testing.assert_allclose(
        np.asarray(out1["vip_input_chunks"])[1], np.asarray(out2["vip_input_chunks"])[1],
        rtol=1e-5, atol=1e-5,
    )
    # non-dropped sample's tokens unchanged (same video)
    np.testing.assert_allclose(
        np.asarray(out1["vip_input_chunks"])[0], np.asarray(out2["vip_input_chunks"])[0],
        rtol=1e-5, atol=1e-5,
    )


def test_t5_encoder_tiny():
    from tokensgen_tpu.models.t5 import T5Config, T5Encoder

    cfg = T5Config.tiny()
    model = T5Encoder(cfg)
    ids = jnp.asarray([[5, 10, 3, 0, 0, 0]])
    mask = jnp.asarray([[True, True, True, False, False, False]])
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    out = model.apply(params, ids, mask)
    assert out.shape == (1, 6, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()
    # masked positions must not influence valid outputs
    ids2 = ids.at[0, 4].set(99)
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(out)[0, :3], np.asarray(out2)[0, :3],
                               rtol=1e-5, atol=1e-6)


def test_hash_text_encoder_deterministic():
    from tokensgen_tpu.models.text_encoder import CachedTextEncoder, HashTextEncoder

    enc = CachedTextEncoder(HashTextEncoder(max_length=8, embed_dim=16))
    a1 = np.asarray(enc(["a cat", "a dog"]))
    a2 = np.asarray(enc(["a cat", "a dog"]))
    np.testing.assert_array_equal(a1, a2)
    assert not np.allclose(a1[0], a1[1])

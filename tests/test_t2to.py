"""T2To pipeline + trainer tests at tiny scale."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokensgen_tpu.core import pca as P
from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
from tokensgen_tpu.pipelines.t2to import T2ToConfig, T2ToPipeline, extend_generated_tokens
from tokensgen_tpu.train import t2to as t2to_train


def _tiny_t2to_dit():
    # patch_size=1 raw-token model over an 8x12 grid, 16 channels
    return DiTConfig.tiny(patch_size=1, sample_height=8, sample_width=12,
                          attention_head_dim=64, num_attention_heads=1)


@pytest.fixture(scope="module")
def setup():
    dcfg = _tiny_t2to_dit()
    cfg = T2ToConfig(num_inference_steps=4, token_dim=48, stochastic=False)
    rng = np.random.default_rng(0)
    # fitted PCA on 48-dim token space
    data = jnp.asarray(rng.normal(size=(200, 48)), jnp.float32)
    pca = P.fit(data, None)
    mean = jnp.asarray(rng.normal(size=(1, 48)), jnp.float32)
    std = jnp.asarray(rng.uniform(0.5, 2.0, size=(1, 48)), jnp.float32)

    dit = CogVideoXTransformer(dcfg)
    f = 8
    pipe = T2ToPipeline(cfg, dcfg, None, pca=pca, token_mean=mean, token_std=std)
    rope = pipe.rope(f)
    params = dit.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, f, 16, 8, 12)),
        jnp.zeros((2, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        jnp.zeros((2,), jnp.int32),
        image_rotary_emb=rope,
    )
    pipe.dit_params = params
    return dcfg, cfg, pipe


def test_vip1_schedule_used_by_default(setup):
    _, _, pipe = setup
    assert pipe.sched.config.beta_schedule == "vip_1"


def test_generate_tokens_and_postprocess(setup):
    dcfg, cfg, pipe = setup
    rng = np.random.default_rng(1)
    text = jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32)
    out = pipe(text, jnp.zeros_like(text), num_chunks=2, rng=jax.random.PRNGKey(1))
    assert out.shape == (1, 8, 48, 8, 12)
    assert np.isfinite(np.asarray(out)).all()
    # postprocessed tokens live on the PCA manifold: transform has only 16 free dims
    flat = np.asarray(out).transpose(0, 1, 3, 4, 2).reshape(-1, 48)
    y = np.asarray(P.transform(pipe.pca, jnp.asarray(flat)))
    np.testing.assert_allclose(y[:, 16:], 0.0, atol=1e-3)


def test_extend_generated_tokens():
    toks = jnp.arange(8).reshape(1, 8, 1, 1, 1).astype(jnp.float32)
    out = extend_generated_tokens(toks, num_chunks=2)
    assert out.shape == (1, 12, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out)[0, 8:, 0, 0, 0], 7.0)


def test_pca_normalization_roundtrip():
    rng = np.random.default_rng(2)
    pca = P.fit(jnp.asarray(rng.normal(size=(100, 48)), jnp.float32), None)
    mean = jnp.zeros((1, 48))
    std = jnp.ones((1, 48))
    toks = jnp.asarray(rng.normal(size=(1, 4, 48, 2, 3)), jnp.float32)
    norm = t2to_train.pca_normalization(toks, pca, mean, std, keep=16)
    assert norm.shape == (1, 4, 16, 2, 3)


def test_train_step_with_masks(setup):
    dcfg, _, _ = setup
    sched = S.make_schedule(S.ScheduleConfig(beta_schedule="vip_1"))
    tcfg = t2to_train.T2ToTrainConfig()
    opt = t2to_train.make_optimizer(tcfg)
    step = t2to_train.make_train_step(dcfg, sched, tcfg, opt)

    rng = np.random.default_rng(3)
    f = 8
    batch = {
        "latents": jnp.asarray(rng.normal(size=(2, f, 16, 8, 12)), jnp.float32),
        "text_embeds": jnp.asarray(rng.normal(size=(2, dcfg.max_text_seq_length, dcfg.text_embed_dim)), jnp.float32),
        "valid_frames": jnp.asarray([8, 4]),
    }
    dit = CogVideoXTransformer(dcfg)
    pipe_rope_dims = (52, 6, 6)
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    rope = get_3d_rotary_pos_embed_v2(64, np.arange(f), np.arange(8), np.arange(12),
                                      dim_t=52, dim_h=6, dim_w=6)
    params = dit.init(jax.random.PRNGKey(0), batch["latents"], batch["text_embeds"],
                      jnp.zeros((2,), jnp.int32), image_rotary_emb=rope)["params"]
    opt_state = opt.init(params)
    new_params, opt_state, metrics = jax.jit(step)(params, opt_state, batch,
                                                   jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    # all params should move (full finetune)
    import flax
    old = flax.traverse_util.flatten_dict(params)
    new = flax.traverse_util.flatten_dict(new_params)
    moved = sum(
        0 if np.allclose(np.asarray(old[k]), np.asarray(new[k])) else 1 for k in old
    )
    assert moved > len(old) * 0.9


def test_padded_chunk_masks():
    key_bias, loss_mask = t2to_train.padded_chunk_masks(
        jnp.asarray([4, 2]), num_frames=4, hw=6, text_len=3
    )
    assert key_bias.shape == (2, 3 + 24)
    kb = np.asarray(key_bias)
    assert (kb[0] == 0).all()
    assert (kb[1, :3] == 0).all()  # text always valid
    assert (kb[1, 3 + 12:] < -1e8).all()  # frames 2,3 masked
    lm = np.asarray(loss_mask)
    assert lm[1, 2:].sum() == 0 and lm[1, :2].sum() == 2


def test_vip_encode_video_latents():
    """Precomputed VAE latents -> frozen patch-proj + resampler -> condensed
    tokens (`train_cogvideo_t2to.py:1715-1740`)."""
    from tokensgen_tpu.models.dit import DiTConfig, VIPConfig, CogVideoXTransformer
    from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
    from tokensgen_tpu.train.t2to import vip_encode_video_latents
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2

    vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=2,
                   num_width_queries=3, length=3 * 2 * 3)
    dcfg = DiTConfig.tiny(vip=vc, sample_height=4, sample_width=6)
    rcfg = ResamplerConfig.tiny(embedding_dim=dcfg.inner_dim, output_dim=24,
                                num_temporal_queries=2, num_height_queries=2,
                                num_width_queries=3)
    rng = np.random.default_rng(0)
    d = dcfg.attention_head_dim
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(3), np.arange(2), np.arange(3))
    dit = CogVideoXTransformer(dcfg)
    dit_params = dit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 4, 6)),
        jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32),
        vip_hidden_states=jnp.zeros((1, 3, 24, 2, 3)),
        image_rotary_emb=rope, vip_image_rotary_emb=rope,
        vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(d, np.arange(3), np.arange(2), np.arange(3)),
    )["params"]
    rs_params = Resampler(rcfg).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 3, 6, rcfg.embedding_dim)))

    vae_latents = jnp.asarray(rng.normal(size=(2, 9, 16, 4, 6)), jnp.float32)  # 3 chunks
    toks = vip_encode_video_latents(dcfg, dit_params, rcfg, rs_params, vae_latents,
                                    nf_per_chunk=3)
    assert toks.shape == (2, 3 * 2, 24, 2, 3)  # 3 chunks x 2 temporal queries
    assert np.isfinite(np.asarray(toks)).all()

"""End-to-end To2V pipeline test at tiny scale: VAE -> patch-proj -> resampler ->
base denoise -> FIFO -> decode. Exercises the full edit workload wiring
(config/infer/edit.yaml path) with random weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig, VIPConfig, graft_vip_params
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner
from tokensgen_tpu.pipelines.to2v import To2VConfig, To2VPipeline


def build_tiny_pipe():
    cfg = To2VConfig(
        height=32, width=48, num_frames_per_chunk=9, num_inference_steps=6,
        num_partitions=2, stochastic=False,
    )
    assert cfg.nf_latent == 3
    vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=2,
                   num_width_queries=3, length=3 * 2 * 3)
    dcfg = DiTConfig.tiny(vip=vc, sample_height=4, sample_width=6)
    rcfg = ResamplerConfig.tiny(embedding_dim=dcfg.inner_dim, output_dim=24,
                                num_temporal_queries=2, num_height_queries=2,
                                num_width_queries=3)
    vcfg = VAEConfig.tiny(sample_height=32, sample_width=48)

    rng = jax.random.PRNGKey(0)
    r1, r2, r3 = jax.random.split(rng, 3)

    vae_model = AutoencoderKLCogVideoX(vcfg)
    vae_params = vae_model.init(r1, jnp.zeros((1, 9, 32, 48, 3)))
    vae_runner = VAERunner(vcfg, vae_params)

    rs = Resampler(rcfg)
    rs_params = rs.init(r2, jnp.zeros((1, 3, 6, rcfg.embedding_dim)))

    dit = CogVideoXTransformer(dcfg)
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    d = dcfg.attention_head_dim
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(3), np.arange(2), np.arange(3))
    dit_params = dit.init(
        r3,
        jnp.zeros((1, 3, 16, 4, 6)),
        jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32),
        vip_hidden_states=jnp.zeros((1, 3, 24, 2, 3)),
        image_rotary_emb=rope,
        vip_image_rotary_emb=rope,
        vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(d, np.arange(3), np.arange(2), np.arange(3)),
    )
    dit_params = {"params": graft_vip_params(dit_params["params"], dcfg)}

    sched = S.make_schedule(S.ScheduleConfig())
    return To2VPipeline(cfg, dcfg, dit_params, rcfg, rs_params, vae_runner, sched)


@pytest.fixture(scope="module")
def pipe():
    return build_tiny_pipe()


def test_vip_encode_video(pipe):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)), jnp.float32)
    emb = pipe.vip_encode_video(frames, rng=jax.random.PRNGKey(1))
    # 2 chunks + 1 pad chunk, 2 temporal queries each; CFG batch 2
    assert emb.shape == (2, 2 * 3, 24, 2, 3)
    assert np.isfinite(np.asarray(emb)).all()


def test_generate_end_to_end(pipe):
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32)
    neg = jnp.zeros_like(text)
    out = pipe.generate(text, neg, frames=frames, num_chunks=2,
                        rng=jax.random.PRNGKey(2))
    # 2 chunks x 3 latent frames
    assert out["latents"].shape == (1, 6, 16, 4, 6)
    assert out["orig_latents"].shape == (1, 3, 16, 4, 6)
    assert out["video"].shape == (1, 18, 32, 48, 3)
    assert out["orig_video"].shape == (1, 9, 32, 48, 3)
    assert np.isfinite(np.asarray(out["video"])).all()


def test_generate_skip_fifo(pipe):
    """skip_fifo=True stops after the base denoise: same orig_latents as the
    full run (same rng split), no FIFO outputs."""
    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32)
    neg = jnp.zeros_like(text)
    full = pipe.generate(text, neg, frames=frames, num_chunks=2,
                         rng=jax.random.PRNGKey(9), decode=False)
    base = pipe.generate(text, neg, frames=frames, num_chunks=2,
                         rng=jax.random.PRNGKey(9), decode=False,
                         skip_fifo=True)
    assert set(base.keys()) == {"orig_latents"}
    np.testing.assert_array_equal(
        np.asarray(full["orig_latents"]), np.asarray(base["orig_latents"]))


def test_generate_sharded_queue(pipe):
    from tokensgen_tpu.sharding import MeshSpec, make_mesh

    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32)
    neg = jnp.zeros_like(text)
    mesh = make_mesh(MeshSpec(data=1, queue=4))
    out1 = pipe.generate(text, neg, frames=frames, num_chunks=2,
                         rng=jax.random.PRNGKey(3), decode=False)
    out2 = pipe.generate(text, neg, frames=frames, num_chunks=2,
                         rng=jax.random.PRNGKey(3), mesh=mesh, decode=False)
    np.testing.assert_allclose(
        np.asarray(out1["latents"]), np.asarray(out2["latents"]), rtol=2e-3, atol=2e-4
    )


def test_generate_separate_guidance():
    """3-way CFG (uncond_txt / uncond_img / txt+img) through base + FIFO."""
    from tokensgen_tpu.core import schedule as S
    from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig, VIPConfig, graft_vip_params
    from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
    from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner
    from tokensgen_tpu.pipelines.to2v import To2VConfig, To2VPipeline
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2

    cfg = To2VConfig(height=32, width=48, num_frames_per_chunk=9,
                     num_inference_steps=6, num_partitions=2, stochastic=False,
                     use_separate_guidance=True, guidance_scale_img=1.5)
    vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=2,
                   num_width_queries=3, length=3 * 2 * 3)
    dcfg = DiTConfig.tiny(vip=vc, sample_height=4, sample_width=6)
    rcfg = ResamplerConfig.tiny(embedding_dim=dcfg.inner_dim, output_dim=24,
                                num_temporal_queries=2, num_height_queries=2,
                                num_width_queries=3)
    vcfg = VAEConfig.tiny(sample_height=32, sample_width=48)
    r1, r2, r3 = jax.random.split(jax.random.PRNGKey(0), 3)
    vae_model = AutoencoderKLCogVideoX(vcfg)
    vae = VAERunner(vcfg, vae_model.init(r1, jnp.zeros((1, 9, 32, 48, 3))))
    rs_params = Resampler(rcfg).init(r2, jnp.zeros((1, 3, 6, rcfg.embedding_dim)))
    d = dcfg.attention_head_dim
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(3), np.arange(2), np.arange(3))
    dit = CogVideoXTransformer(dcfg)
    dit_params = dit.init(
        r3, jnp.zeros((1, 3, 16, 4, 6)),
        jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32),
        vip_hidden_states=jnp.zeros((1, 3, 24, 2, 3)),
        image_rotary_emb=rope, vip_image_rotary_emb=rope,
        vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(d, np.arange(3), np.arange(2), np.arange(3)))
    dit_params = {"params": graft_vip_params(dit_params["params"], dcfg)}
    pipe3 = To2VPipeline(cfg, dcfg, dit_params, rcfg, rs_params, vae,
                         S.make_schedule(S.ScheduleConfig()))

    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32)
    emb = pipe3.vip_encode_video(frames, rng=jax.random.PRNGKey(1))
    assert emb.shape[0] == 3  # [img, uncond_img, img]
    out = pipe3.generate(text, jnp.zeros_like(text), image_embeddings=emb,
                         num_chunks=2, rng=jax.random.PRNGKey(2), decode=False)
    assert out["latents"].shape == (1, 6, 16, 4, 6)
    assert np.isfinite(np.asarray(out["latents"])).all()


def test_generate_with_cache_videos(pipe):
    rng = np.random.default_rng(9)
    frames = jnp.asarray(rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32)
    out = pipe.generate(text, jnp.zeros_like(text), frames=frames, num_chunks=2,
                        rng=jax.random.PRNGKey(4), cache_idx=(0,))
    assert out["cache_x0"].shape[0] == 1
    assert "cache_videos" in out and len(out["cache_videos"]) == 1
    cv = np.asarray(out["cache_videos"][0])
    # 6 valid captures -> truncated to 2 decode chunks of 3 latent frames
    assert cv.shape[0] == 1 and cv.shape[1] % 9 == 0 and cv.shape[1] > 0


def test_generate_offload_vae_matches(pipe):
    """offload_vae=True phase orchestration must not change results (on CPU
    the device_puts are placement no-ops, but the full code path runs)."""
    rng = np.random.default_rng(7)
    frames = jnp.asarray(rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32)
    neg = jnp.zeros_like(text)
    out1 = pipe.generate(text, neg, frames=frames, num_chunks=2,
                         rng=jax.random.PRNGKey(5))
    out2 = pipe.generate(text, neg, frames=frames, num_chunks=2,
                         rng=jax.random.PRNGKey(5), offload_vae=True)
    np.testing.assert_allclose(np.asarray(out1["video"]),
                               np.asarray(out2["video"]), rtol=1e-5, atol=1e-5)


def test_sequential_cfg_matches_batched(pipe):
    """sequential_cfg=True (per-branch B=1 forwards; the full-depth single-chip
    memory mode) must produce the same latents as the batched CFG forward."""
    import dataclasses

    from tokensgen_tpu.pipelines.to2v import To2VPipeline

    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.normal(size=(2, 2 * 3, 24, 2, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32)
    neg = jnp.zeros_like(text)
    seq_pipe = To2VPipeline(
        dataclasses.replace(pipe.cfg, sequential_cfg=True), pipe.dit_config,
        pipe.dit_params, pipe.resampler_config, pipe.resampler_params,
        pipe.vae, pipe.sched)
    out_b = pipe.generate(text, neg, image_embeddings=emb, num_chunks=2,
                          rng=jax.random.PRNGKey(6), decode=False)
    out_s = seq_pipe.generate(text, neg, image_embeddings=emb, num_chunks=2,
                              rng=jax.random.PRNGKey(6), decode=False)
    np.testing.assert_allclose(np.asarray(out_b["latents"]),
                               np.asarray(out_s["latents"]),
                               rtol=2e-3, atol=2e-4)


def test_decode_latents_remainder(pipe):
    """A latent count that is not a multiple of nf_latent decodes the tail as
    a short chunk instead of silently dropping it (FIFO outputs can end on a
    partial window)."""
    rng = np.random.default_rng(7)
    lat = jnp.asarray(rng.normal(size=(1, 4, 16, 4, 6)), jnp.float32)
    video = pipe.decode_latents(lat)
    # 3-frame chunk -> 9 px frames, 1-frame tail -> 1 px frame (causal VAE)
    assert video.shape == (1, 10, 32, 48, 3)
    assert np.isfinite(np.asarray(video)).all()

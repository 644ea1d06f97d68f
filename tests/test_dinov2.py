"""DINOv2 encoder parity vs transformers' Dinov2Model (random tiny weights),
through convert_dinov2 — the reference loads the encoder with AutoModel and
consumes hidden_states[-2] (`pipeline_cogvideox_mp_fifo.py:516`)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tokensgen_tpu.models.dinov2 import (
    DINOv2Config,
    DINOv2Encoder,
    convert_dinov2,
    preprocess_frames,
)

transformers = pytest.importorskip("transformers")


def _oracle(cfg: DINOv2Config):
    torch.manual_seed(0)
    hf_cfg = transformers.Dinov2Config(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        mlp_ratio=cfg.intermediate_size // cfg.hidden_size,
        patch_size=cfg.patch_size, image_size=cfg.image_size)
    m = transformers.Dinov2Model(hf_cfg).eval()
    # randomise the zero-init layerscale lambdas so they are load-bearing
    for name, p in m.named_parameters():
        if "lambda1" in name:
            p.data = torch.rand_like(p.data) + 0.5
    return m


def test_dinov2_penultimate_parity():
    cfg = DINOv2Config.tiny()
    tm = _oracle(cfg)
    params = convert_dinov2({k: v.numpy() for k, v in tm.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(px), output_hidden_states=True).hidden_states[-2]
    got = DINOv2Encoder(cfg).apply({"params": params}, jnp.asarray(px))
    assert got.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4)


def test_preprocess_frames():
    rng = np.random.default_rng(1)
    frames = rng.uniform(-1, 1, size=(3, 17, 23, 3)).astype(np.float32)
    out = preprocess_frames(jnp.asarray(frames), image_size=32)
    assert out.shape == (3, 3, 32, 32)
    # a full-white frame maps to (1 - mean) / std exactly
    white = preprocess_frames(jnp.ones((1, 8, 8, 3)), image_size=16)
    exp = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(
        np.asarray(white)[0, :, 0, 0], exp, atol=1e-5)


def test_pipeline_dinov2_path():
    """encode_image_dinov2 end-to-end at tiny config: shapes + CFG batching."""
    import jax

    from tokensgen_tpu.models.dit import DiTConfig
    from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
    from tokensgen_tpu.pipelines.to2v import To2VConfig, To2VPipeline

    enc_cfg = DINOv2Config.tiny()
    tm = _oracle(enc_cfg)
    enc_params = convert_dinov2(
        {k: v.numpy() for k, v in tm.state_dict().items()}, enc_cfg)

    # resampler consumes [B, F, N, E=hidden]
    rcfg = ResamplerConfig.tiny(embedding_dim=enc_cfg.hidden_size)
    rng = jax.random.PRNGKey(0)
    res_params = Resampler(rcfg).init(
        rng, jnp.zeros((1, 2, 5, enc_cfg.hidden_size)))

    dcfg = DiTConfig.tiny()
    pcfg = To2VConfig(height=32, width=48, num_frames_per_chunk=2,
                      num_inference_steps=2)
    pipe = To2VPipeline(pcfg, dcfg, None, rcfg, res_params, None,
                        image_encoder=(DINOv2Encoder(enc_cfg), {"params": enc_params}))

    frames = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, size=(1, 4, 32, 48, 3)).astype(np.float32))
    toks = pipe.encode_image_dinov2(frames, do_cfg=True, num_tokens=4)
    # CFG pair [uncond, cond]; 2 chunks x 2 temporal queries
    assert toks.shape == (2, 4, rcfg.output_dim, 2, 3)
    uncond, cond = np.asarray(toks[0]), np.asarray(toks[1])
    assert not np.allclose(uncond, cond)

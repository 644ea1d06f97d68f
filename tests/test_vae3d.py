"""3D causal VAE tests: shapes, cache-carry consistency, tiling (tiny config)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokensgen_tpu.models.vae3d import (
    AutoencoderKLCogVideoX,
    VAEConfig,
    VAERunner,
    sample_latent,
)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = VAEConfig.tiny()
    model = AutoencoderKLCogVideoX(cfg)
    x = jnp.zeros((1, 9, cfg.sample_height, cfg.sample_width, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return cfg, model, params


def test_encode_shapes(tiny_vae):
    cfg, model, params = tiny_vae
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 9, 32, 48, 3)), jnp.float32)
    moments, _ = model.apply(params, x, None, method=AutoencoderKLCogVideoX.encode)
    # 8x spatial, 4x temporal ((9-1)/4+1=3), 2*16 moment channels
    assert moments.shape == (1, 3, 4, 6, 32)
    lat = sample_latent(moments, None)
    assert lat.shape == (1, 3, 4, 6, 16)


def test_decode_shapes(tiny_vae):
    cfg, model, params = tiny_vae
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(1, 3, 4, 6, 16)), jnp.float32)
    out, _ = model.apply(params, z, None, method=AutoencoderKLCogVideoX.decode)
    assert out.shape == (1, 9, 32, 48, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_frame_batched_encode_is_causal(tiny_vae):
    """Batched encode (conv-cache carry) must be causal: perturbing the second
    frame batch leaves the first batch's latents bit-identical, and the carried
    cache must actually influence the second batch.

    (Note: batched encode is NOT equal to single-shot whole-clip encode — GroupNorm
    normalises over the temporal extent of each batch; the reference has the same
    property and only ever uses the batched path, `autoencoder_kl_cogvideox.py:
    1085-1109`.)"""
    cfg, model, params = tiny_vae
    rng = np.random.default_rng(2)
    x = np.asarray(rng.normal(size=(1, 17, 32, 48, 3)), np.float32)
    runner = VAERunner(cfg, params)
    lat1 = np.asarray(runner._encode_frames(jnp.asarray(x)))
    x2 = x.copy()
    x2[:, 9:] += 1.0  # second frame-batch only (spans are (0,9), (9,17))
    lat2 = np.asarray(runner._encode_frames(jnp.asarray(x2)))
    assert lat1.shape == (1, 5, 4, 6, 32)
    np.testing.assert_array_equal(lat1[:, :3], lat2[:, :3])  # first batch latents
    assert not np.allclose(lat1[:, 3:], lat2[:, 3:])

    # carried cache matters: encoding batch 2 with a fresh cache differs
    fresh, _ = model.apply(params, jnp.asarray(x[:, 9:]), {},
                           method=AutoencoderKLCogVideoX.encode)
    assert not np.allclose(np.asarray(fresh), lat1[:, 3:])


def test_frame_batched_decode_is_causal(tiny_vae):
    cfg, model, params = tiny_vae
    rng = np.random.default_rng(3)
    z = np.asarray(rng.normal(size=(1, 5, 4, 6, 16)), np.float32)
    runner = VAERunner(cfg, params)
    out1 = np.asarray(runner._decode_frames(jnp.asarray(z)))  # spans (0,3), (3,5)
    z2 = z.copy()
    z2[:, 3:] += 1.0
    out2 = np.asarray(runner._decode_frames(jnp.asarray(z2)))
    assert out1.shape == (1, 17, 32, 48, 3)
    np.testing.assert_array_equal(out1[:, :9], out2[:, :9])
    assert not np.allclose(out1[:, 9:], out2[:, 9:])


def test_roundtrip_finite_and_reasonable(tiny_vae):
    cfg, model, params = tiny_vae
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 9, 32, 48, 3)), jnp.float32)
    out = model.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_tiled_encode_shape(tiny_vae):
    """Tile geometry mirrors the reference's tuned 720x480 proportions: the tiling
    math only composes exactly when overlap/8 == latent row limit (true for tile
    48 with factor 1/6 and tile 40 with factor 1/5)."""
    cfg, model, params = tiny_vae
    rng = np.random.default_rng(5)
    runner = VAERunner(cfg, params, use_tiling=True,
                       tile_sample_min_height=48, tile_sample_min_width=40)
    x = jnp.asarray(rng.normal(size=(1, 9, 96, 64, 3)), jnp.float32)
    lat_tiled = runner.encode(x)
    lat_full = runner._encode_frames(x)
    assert lat_tiled.shape == lat_full.shape == (1, 3, 12, 8, 32)
    assert np.isfinite(np.asarray(lat_tiled)).all()


def test_tiled_decode_shape(tiny_vae):
    cfg, model, params = tiny_vae
    rng = np.random.default_rng(6)
    runner = VAERunner(cfg, params, use_tiling=True,
                       tile_sample_min_height=48, tile_sample_min_width=40)
    z = jnp.asarray(rng.normal(size=(1, 3, 12, 8, 16)), jnp.float32)
    out = runner.decode(z)
    assert out.shape == (1, 9, 96, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_latent_stochastic():
    rng = np.random.default_rng(7)
    moments = jnp.asarray(rng.normal(size=(1, 2, 3, 3, 8)), jnp.float32)
    mode = sample_latent(moments, None)
    s1 = sample_latent(moments, jax.random.PRNGKey(0))
    s2 = sample_latent(moments, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(mode), np.asarray(moments[..., :4]))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_runner_decode_frame_count_multi_batch(tiny_vae):
    """VAERunner decode in 2-latent-frame batches must emit 1 + 4*(f-1) pixel
    frames (temporal 4x with a single causal first frame) — regression for the
    1-frame-batch bug where the causal temporal upsample (which only doubles
    time when a batch has >= 2 frames) silently stopped upsampling."""
    cfg, model, params = tiny_vae
    runner = VAERunner(cfg, params)
    rng = np.random.default_rng(3)
    # odd latent counts only: causally-encoded clips always produce
    # 1 + 4k latent->pixel frames, so f = 1+(px-1)/4 is odd in practice
    # (13 for a 49-frame chunk); the first batch absorbs the remainder and
    # stays odd, which is what arms the causal first-frame upsample path.
    for f in (3, 5, 7):
        z = jnp.asarray(rng.normal(size=(1, f, 4, 6, 16)), jnp.float32)
        out = runner.decode(z)
        assert out.shape[1] == 1 + 4 * (f - 1), (f, out.shape)


def test_tiled_decode_crops_to_exact_size(tiny_vae):
    """Clipped edge tiles can over-produce; the assembled canvas must be
    cropped to exactly latent*8 (found via a 480x368-tile probe on TPU that
    returned width 734 instead of 720)."""
    cfg, model, params = tiny_vae
    runner = VAERunner(cfg, params, use_tiling=True,
                       tile_sample_min_height=32, tile_sample_min_width=40)
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=(1, 3, 4, 6, 16)), jnp.float32)
    out = runner.decode(z)
    assert out.shape == (1, 9, 32, 48, 3), out.shape

"""Alternate sampling modes: denoising_together + FreeInit."""

import numpy as np
import jax
import jax.numpy as jnp

from tokensgen_tpu.sampling.freeinit import (
    butterworth_low_pass_3d, freeinit_refine, freq_mix_3d,
)


def test_butterworth_mask():
    m = np.asarray(butterworth_low_pass_3d((4, 8, 8)))
    assert m.shape == (4, 8, 8)
    # DC (center) ~1, corners ~0
    assert m[2, 4, 4] > 0.9
    assert m[0, 0, 0] < 0.1


def test_freq_mix_preserves_low_frequencies():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.broadcast_to(
        rng.normal(size=(1, 1, 2, 1, 1)), (1, 4, 2, 8, 8)).copy(), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(1, 4, 2, 8, 8)), jnp.float32)
    lpf = butterworth_low_pass_3d((4, 8, 8), d_s=1.0, d_t=1.0, order=8)
    out = freq_mix_3d(x, noise, lpf)
    # with a wide-open low-pass, output ~= x
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0.3)


def test_freeinit_refine_loop():
    calls = []

    def denoise_fn(lat, r):
        calls.append("d")
        return lat * 0.5

    def add_noise_fn(clean, noise):
        return clean + 0.1 * noise

    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 4, 2, 8, 8))
    out = freeinit_refine(denoise_fn, add_noise_fn, x, rng, num_iters=3)
    assert calls == ["d", "d", "d"]
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_denoise_together_pipeline(tmp_path):
    """Uses the tiny To2V pipeline fixture pattern; joint 2-chunk denoise."""
    from tests.test_pipeline_to2v import build_tiny_pipe

    pipe = build_tiny_pipe()
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, 8, 24)), jnp.float32)
    emb = pipe.vip_encode_video(frames, rng=jax.random.PRNGKey(2))
    out = pipe.denoise_together(text, jnp.zeros_like(text), emb, num_chunks=2,
                                rng=jax.random.PRNGKey(3))
    assert out.shape == (1, 6, 16, 4, 6)
    assert np.isfinite(np.asarray(out)).all()
    # freeinit variant
    out2 = pipe.denoise_together(text, jnp.zeros_like(text), emb, num_chunks=2,
                                 rng=jax.random.PRNGKey(3), freeinit_iters=2)
    assert out2.shape == (1, 6, 16, 4, 6)
    assert not np.allclose(np.asarray(out), np.asarray(out2))

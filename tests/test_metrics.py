import numpy as np

from tokensgen_tpu.metrics.quality import (
    delta_e_ab, evaluate_video, perceptual_distance, psnr, rgb_to_lab, ssim,
)


def test_psnr_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3))
    assert psnr(img, img) == float("inf")
    noisy = np.clip(img + rng.normal(scale=0.1, size=img.shape), 0, 1)
    p = psnr(img, noisy)
    assert 15 < p < 25  # sigma 0.1 -> ~20 dB


def test_ssim_bounds():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(48, 48, 3))
    assert ssim(img, img) > 0.999
    other = rng.uniform(size=(48, 48, 3))
    assert ssim(img, other) < 0.3


def test_rgb_to_lab_white_black():
    white = rgb_to_lab(np.ones((1, 1, 3)))
    np.testing.assert_allclose(white[0, 0, 0], 100.0, atol=0.1)
    np.testing.assert_allclose(white[0, 0, 1:], 0.0, atol=0.5)
    black = rgb_to_lab(np.zeros((1, 1, 3)))
    np.testing.assert_allclose(black[0, 0, 0], 0.0, atol=0.1)


def test_delta_e():
    img = np.full((8, 8, 3), 0.5)
    assert delta_e_ab(img, img) == 0.0
    assert delta_e_ab(img, np.full((8, 8, 3), 0.6)) > 0


def test_perceptual_distance():
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(64, 64, 3))
    assert perceptual_distance(a, a) < 1e-10
    b = rng.uniform(size=(64, 64, 3))
    assert perceptual_distance(a, b) > 0


def test_evaluate_video():
    rng = np.random.default_rng(3)
    v1 = rng.uniform(size=(3, 32, 32, 3))
    v2 = np.clip(v1 + rng.normal(scale=0.05, size=v1.shape), 0, 1)
    m = evaluate_video(v1, v2)
    assert set(m) == {"psnr", "ssim", "delta_e"}
    assert m["psnr"] > 20 and 0 < m["ssim"] <= 1

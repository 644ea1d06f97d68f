"""Image/video quality metrics (numpy/JAX; no skimage dependency).

Parity targets: `/root/reference/longvgen/metrics/psnr_ssim.py` (PSNR, SSIM,
ΔE_ab), `metrics/lpips.py` (perceptual distance), `utils/color_util.py`
(RGB->Lab). The reference ships these unwired (SURVEY §4); here `evaluate_video`
is called by the trainers' validation hooks.

All functions take float arrays in [0, 1]; video shapes [F, H, W, 3] or image
[H, W, 3].
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(max_val**2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def _filter2(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Valid-mode 2D convolution per channel via FFT-free sliding windows."""
    from numpy.lib.stride_tricks import sliding_window_view

    k = kernel.shape[0]
    win = sliding_window_view(img, (k, k), axis=(0, 1))
    return np.einsum("...ij,ij->...", win, kernel)


def ssim(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Gaussian-window SSIM (the standard Wang et al. constants), averaged over
    channels."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kernel = _gaussian_kernel()
    vals = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mu_x = _filter2(x, kernel)
        mu_y = _filter2(y, kernel)
        mu_x2, mu_y2, mu_xy = mu_x**2, mu_y**2, mu_x * mu_y
        sig_x = _filter2(x * x, kernel) - mu_x2
        sig_y = _filter2(y * y, kernel) - mu_y2
        sig_xy = _filter2(x * y, kernel) - mu_xy
        m = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
            (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
        )
        vals.append(m.mean())
    return float(np.mean(vals))


# --------------------------------------------------------------- color (Lab)


def rgb_to_xyz(rgb: np.ndarray) -> np.ndarray:
    rgb = np.asarray(rgb, np.float64)
    mask = rgb > 0.04045
    lin = np.where(mask, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    m = np.array([
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ])
    return lin @ m.T


def xyz_to_lab(xyz: np.ndarray) -> np.ndarray:
    white = np.array([0.950456, 1.0, 1.088754])
    x = xyz / white
    eps = 6.0 / 29.0
    f = np.where(x > eps**3, np.cbrt(x), x / (3 * eps**2) + 4.0 / 29.0)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([l, a, b], axis=-1)


def rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    return xyz_to_lab(rgb_to_xyz(rgb))


def delta_e_ab(a: np.ndarray, b: np.ndarray) -> float:
    """Mean CIE76 ΔE*ab between two RGB images in [0,1]."""
    return float(np.mean(np.linalg.norm(rgb_to_lab(a) - rgb_to_lab(b), axis=-1)))


# ---------------------------------------------------------------- perceptual


def perceptual_distance(
    a: np.ndarray,
    b: np.ndarray,
    feature_fn: Optional[Callable[[np.ndarray], list]] = None,
) -> float:
    """Weights-free perceptual PROXY (random-projection feature pyramid) — NOT
    comparable to published LPIPS numbers. For true LPIPS use
    `metrics.lpips.lpips_video` with converted VGG16 + lin-head weights
    (`metrics/lpips.py`; reference `longvgen/metrics/lpips.py:1-47`).
    ``feature_fn`` maps [H, W, 3] -> list of [h, w, c] feature maps."""
    if feature_fn is None:
        feature_fn = _random_pyramid_features
    fa, fb = feature_fn(a), feature_fn(b)
    dists = []
    for x, y in zip(fa, fb):
        xn = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
        yn = y / (np.linalg.norm(y, axis=-1, keepdims=True) + 1e-10)
        dists.append(np.mean((xn - yn) ** 2))
    return float(np.mean(dists))


def _random_pyramid_features(img: np.ndarray, levels: int = 3, dim: int = 32):
    rng = np.random.default_rng(0)  # fixed projection
    feats = []
    x = np.asarray(img, np.float64)
    for lvl in range(levels):
        h, w, c = x.shape
        patches = x[: h // 4 * 4, : w // 4 * 4].reshape(h // 4, 4, w // 4, 4, c)
        patches = patches.transpose(0, 2, 1, 3, 4).reshape(h // 4, w // 4, 16 * c)
        proj = rng.normal(size=(patches.shape[-1], dim)) / np.sqrt(patches.shape[-1])
        feats.append(patches @ proj)
        x = patches[..., :c]  # downsampled carrier for next level
    return feats


def evaluate_video(pred: np.ndarray, target: np.ndarray,
                   lpips_params=None) -> Dict[str, float]:
    """Per-video metric dict; frames averaged. Videos are [F, H, W, 3] in [0, 1].
    Pass converted LPIPS weights (`metrics.lpips.load_lpips_params`) to add a
    true "lpips" entry."""
    f = min(pred.shape[0], target.shape[0])
    ps, ss, de = [], [], []
    for i in range(f):
        ps.append(psnr(pred[i], target[i]))
        ss.append(ssim(pred[i], target[i]))
        de.append(delta_e_ab(pred[i], target[i]))
    out = {
        "psnr": float(np.mean(ps)),
        "ssim": float(np.mean(ss)),
        "delta_e": float(np.mean(de)),
    }
    if lpips_params is not None:
        from tokensgen_tpu.metrics.lpips import lpips_video

        out["lpips"] = lpips_video(lpips_params, pred[:f], target[:f])
    return out

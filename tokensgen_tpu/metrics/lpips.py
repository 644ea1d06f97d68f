"""LPIPS (Learned Perceptual Image Patch Similarity), VGG16 variant, in JAX.

The reference wraps the `lpips` pip package (`longvgen/metrics/lpips.py:1-47`,
`lpips.LPIPS(net='vgg')`). This is the same published architecture
(Zhang et al. 2018, v0.1) as pure JAX functions:

* inputs in [-1, 1] are shifted/scaled by the ImageNet statistics layer,
* VGG16 features are tapped after relu1_2 / relu2_2 / relu3_3 / relu4_3 /
  relu5_3 (64/128/256/512/512 channels),
* per tap: channel-unit-normalise both feature maps, squared difference,
  a learned 1x1 "lin" head (non-negative weights in the shipped checkpoints),
  spatial mean; taps are summed.

Weights are converted from the standard torch artifacts with
:func:`convert_lpips` (torchvision `vgg16` state dict + the lpips package's
`vgg.pth` linear heads). Without weights on disk, use
`metrics.quality.perceptual_distance` — a clearly-labelled weights-free proxy
that is NOT comparable to published LPIPS numbers.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 "D" configuration; "M" = 2x2/2 max pool. Taps are after the ReLU of
# conv indices 1, 3, 6, 9, 12 (0-based over the 13 convs).
VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
TAP_CONV_IDX = (1, 3, 6, 9, 12)
TAP_CHANNELS = (64, 128, 256, 512, 512)
# torchvision `vgg16().features` module indices of the 13 convs
TORCHVISION_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def _max_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _vgg_taps(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    taps, ci = [], 0
    for v in VGG_CFG:
        if v == "M":
            x = _max_pool(x)
            continue
        x = jax.nn.relu(_conv(x, params["features"][ci]))
        if ci in TAP_CONV_IDX:
            taps.append(x)
        ci += 1
    return taps


def lpips_distance(params: Dict, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LPIPS between image batches ``a``/``b`` [B, H, W, 3] in [-1, 1] -> [B]."""
    shift, scale = jnp.asarray(_SHIFT), jnp.asarray(_SCALE)
    fa = _vgg_taps(params, (a - shift) / scale)
    fb = _vgg_taps(params, (b - shift) / scale)
    total = 0.0
    for f0, f1, w in zip(fa, fb, params["lins"]):
        n0 = f0 / (jnp.linalg.norm(f0, axis=-1, keepdims=True) + 1e-10)
        n1 = f1 / (jnp.linalg.norm(f1, axis=-1, keepdims=True) + 1e-10)
        d = (n0 - n1) ** 2  # [B, h, w, C]
        total = total + jnp.mean(d @ w, axis=(1, 2))  # 1x1 lin head + spatial avg
    return total


def convert_lpips(vgg_sd: Dict[str, np.ndarray], lin_sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision `vgg16().features` state dict + lpips `vgg.pth` lin heads ->
    LPIPS params pytree (torch conv [O,I,kh,kw] -> [kh,kw,I,O])."""
    feats = []
    for i in TORCHVISION_CONV_IDX:
        feats.append({
            "kernel": np.ascontiguousarray(
                vgg_sd[f"features.{i}.weight"].transpose(2, 3, 1, 0)),
            "bias": vgg_sd[f"features.{i}.bias"],
        })
    lins = []
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in lin_sd:
                lins.append(np.asarray(lin_sd[key]).reshape(-1))
                break
        else:
            raise KeyError(f"lin head {k} not found in lpips state dict")
    return {"features": [jax.tree.map(jnp.asarray, f) for f in feats],
            "lins": [jnp.asarray(w) for w in lins]}


def load_lpips_params(vgg_path: str, lins_path: str) -> Dict:
    """torch.load both artifacts and convert. ``vgg_path``: a torchvision VGG16
    state dict (full model or `.features` prefix-stripped is handled);
    ``lins_path``: the lpips package's `weights/v0.1/vgg.pth`."""
    import torch

    vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=True)
    lin_sd = torch.load(lins_path, map_location="cpu", weights_only=True)
    return convert_lpips({k: v.numpy() for k, v in vgg_sd.items()},
                         {k: v.numpy() for k, v in lin_sd.items()})


def lpips_video(params: Dict, pred: np.ndarray, target: np.ndarray) -> float:
    """Frame-averaged LPIPS between videos [F, H, W, 3] in [0, 1]."""
    a = jnp.asarray(pred, jnp.float32) * 2.0 - 1.0
    b = jnp.asarray(target, jnp.float32) * 2.0 - 1.0
    f = min(a.shape[0], b.shape[0])
    return float(jnp.mean(lpips_distance(params, a[:f], b[:f])))

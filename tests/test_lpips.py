"""LPIPS-VGG parity: our JAX implementation + converter vs a plain-torch
implementation of the published architecture (Zhang et al. 2018 v0.1, the one
the reference uses via `lpips.LPIPS(net='vgg')`), on random weights.

torchvision/lpips are not installed here, so the torch oracle builds VGG16
with torchvision's exact `features.{i}` module indexing and the lpips forward
(scaling layer -> 5 relu taps -> unit-normalise -> squared diff -> 1x1 lin ->
spatial mean -> sum).
"""

import numpy as np
import torch
import torch.nn as nn

from tokensgen_tpu.metrics.lpips import (
    TAP_CHANNELS,
    TORCHVISION_CONV_IDX,
    convert_lpips,
    lpips_distance,
    lpips_video,
)


def _torch_vgg16_features():
    """nn.Sequential with torchvision vgg16().features layout (conv indices
    0,2,5,7,10,12,14,17,19,21,24,26,28)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_c = v
    return nn.Sequential(*layers)


class _TorchLPIPS(nn.Module):
    TAPS = (3, 8, 15, 22, 29)  # module index AFTER which to tap (inclusive relu)

    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.features = _torch_vgg16_features()
        self.lins = nn.ModuleList(
            [nn.Conv2d(c, 1, 1, bias=False) for c in TAP_CHANNELS])
        for lin in self.lins:  # published heads are non-negative
            lin.weight.data.abs_()
        self.register_buffer("shift", torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor([.458, .448, .450]).view(1, 3, 1, 1))

    def taps(self, x):
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.TAPS:
                out.append(x)
                if i == self.TAPS[-1]:
                    break
        return out

    def forward(self, a, b):  # [B, 3, H, W] in [-1, 1]
        fa = self.taps((a - self.shift) / self.scale)
        fb = self.taps((b - self.shift) / self.scale)
        total = 0.0
        for f0, f1, lin in zip(fa, fb, self.lins):
            n0 = f0 / (f0.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            n1 = f1 / (f1.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            total = total + lin((n0 - n1) ** 2).mean(dim=(2, 3)).squeeze(1)
        return total


def _state_dicts(oracle):
    vgg_sd = {f"features.{i}.{kind}": p.detach().numpy()
              for i in TORCHVISION_CONV_IDX
              for kind, p in (("weight", oracle.features[i].weight),
                              ("bias", oracle.features[i].bias))}
    lin_sd = {f"lin{k}.model.1.weight": lin.weight.detach().numpy()
              for k, lin in enumerate(oracle.lins)}
    return vgg_sd, lin_sd


def test_lpips_parity():
    oracle = _TorchLPIPS().eval()
    params = convert_lpips(*_state_dicts(oracle))

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, size=(2, 32, 48, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(2, 32, 48, 3)).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(a).permute(0, 3, 1, 2),
                     torch.from_numpy(b).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(lpips_distance(params, a, b))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)

    # identical inputs -> 0
    same = np.asarray(lpips_distance(params, a, a))
    np.testing.assert_allclose(same, 0.0, atol=1e-7)


def test_lpips_video_helper():
    oracle = _TorchLPIPS().eval()
    params = convert_lpips(*_state_dicts(oracle))
    rng = np.random.default_rng(1)
    pred = rng.uniform(0, 1, size=(3, 32, 32, 3)).astype(np.float32)
    tgt = rng.uniform(0, 1, size=(3, 32, 32, 3)).astype(np.float32)
    d = lpips_video(params, pred, tgt)
    assert d > 0
    assert lpips_video(params, pred, pred) < 1e-6

"""Minimal stand-in for the `diffusers` package — PARITY TESTING ONLY.

The reference schedulers/embeddings (`/root/reference/longvgen/...`) import a
handful of diffusers symbols (ConfigMixin, register_to_config, BaseOutput,
randn_tensor, SchedulerMixin, ...). diffusers is not installed here, but the
reference modules themselves are nearly torch-pure, so a ~100-line shim lets us
import them unmodified and use them as numerical oracles (same pattern as
`tests/test_pca.py`, which imports `/root/reference/pca.py` directly).

`randn_tensor` is made deterministic: tests push explicit noise tensors onto
`NOISE_QUEUE`; with an empty queue it returns zeros, so every stochastic branch
of the oracle is reproducible and comparable against our injectable-noise JAX
steps (`tokensgen_tpu/core/schedule.py`).
"""

from __future__ import annotations

import enum
import functools
import importlib.util
import inspect
import sys
import types

REFERENCE_ROOT = "/root/reference"

#: tests append torch tensors here; randn_tensor pops from the front.
NOISE_QUEUE: list = []


def _mod(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def install() -> None:
    """Register the fake `diffusers` modules in sys.modules (idempotent)."""
    if "diffusers" in sys.modules:
        return
    import torch

    diffusers = _mod("diffusers")

    cfg = _mod("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            self.config = types.SimpleNamespace(
                **{k: v for k, v in bound.arguments.items() if k != "self"}
            )
            init(self, *args, **kwargs)

        return wrapper

    cfg.ConfigMixin = ConfigMixin
    cfg.register_to_config = register_to_config

    utils = _mod("diffusers.utils")

    class BaseOutput:
        pass

    utils.BaseOutput = BaseOutput
    utils.deprecate = lambda *a, **k: None

    tu = _mod("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        if NOISE_QUEUE:
            n = NOISE_QUEUE.pop(0)
            assert tuple(n.shape) == tuple(shape), (n.shape, shape)
            return n.to(device=device, dtype=dtype or n.dtype)
        return torch.zeros(shape, device=device, dtype=dtype)

    tu.randn_tensor = randn_tensor
    utils.torch_utils = tu

    sched_pkg = _mod("diffusers.schedulers")
    su = _mod("diffusers.schedulers.scheduling_utils")

    class SchedulerMixin:
        pass

    class KarrasDiffusionSchedulers(enum.Enum):
        DDIMScheduler = 1

    su.SchedulerMixin = SchedulerMixin
    su.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    sched_pkg.scheduling_utils = su

    models_pkg = _mod("diffusers.models")
    act = _mod("diffusers.models.activations")
    act.FP32SiLU = torch.nn.SiLU
    act.get_activation = lambda *a, **k: torch.nn.SiLU()
    models_pkg.activations = act

    ap = _mod("diffusers.models.attention_processor")

    class Attention(torch.nn.Module):
        pass

    ap.Attention = Attention
    models_pkg.attention_processor = ap

    norm = _mod("diffusers.models.normalization")
    norm.RMSNorm = torch.nn.RMSNorm
    models_pkg.normalization = norm

    mu = _mod("diffusers.models.modeling_utils")

    class ModelMixin(torch.nn.Module):
        pass

    mu.ModelMixin = ModelMixin
    models_pkg.modeling_utils = mu

    # FeedForward must be numerically REAL (the reference Resampler's MLP is
    # diffusers.models.attention.FeedForward with activation "gelu-approximate");
    # state-dict names (net.0.proj, net.2) match diffusers so our converters see
    # the true checkpoint layout.
    attn_mod = _mod("diffusers.models.attention")

    class _GELU(torch.nn.Module):
        def __init__(self, dim_in, dim_out, approximate="none", bias=True):
            super().__init__()
            self.proj = torch.nn.Linear(dim_in, dim_out, bias=bias)
            self.approximate = approximate

        def forward(self, x):
            return torch.nn.functional.gelu(self.proj(x), approximate=self.approximate)

    class FeedForward(torch.nn.Module):
        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu", final_dropout=False, inner_dim=None,
                     bias=True):
            super().__init__()
            inner_dim = inner_dim if inner_dim is not None else int(dim * mult)
            dim_out = dim_out if dim_out is not None else dim
            if activation_fn == "gelu":
                act = _GELU(dim, inner_dim, bias=bias)
            elif activation_fn == "gelu-approximate":
                act = _GELU(dim, inner_dim, approximate="tanh", bias=bias)
            else:
                raise NotImplementedError(f"shim FeedForward: {activation_fn}")
            self.net = torch.nn.ModuleList(
                [act, torch.nn.Dropout(dropout), torch.nn.Linear(inner_dim, dim_out, bias=bias)])
            if final_dropout:
                self.net.append(torch.nn.Dropout(dropout))

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    attn_mod.FeedForward = FeedForward
    models_pkg.attention = attn_mod

    # --- pieces for importing the reference transformer/attention_processor ---
    import logging as _pylogging
    import operator as _op

    from packaging import version as _pkg_version

    ld = _mod("diffusers.loaders")

    class PeftAdapterMixin:
        pass

    ld.PeftAdapterMixin = PeftAdapterMixin
    diffusers.loaders = ld

    def is_torch_version(comparison, ver):
        ops = {"<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge,
               "==": _op.eq, "!=": _op.ne}
        return ops[comparison](
            _pkg_version.parse(torch.__version__.split("+")[0]),
            _pkg_version.parse(ver))

    utils.USE_PEFT_BACKEND = False
    utils.is_torch_version = is_torch_version
    utils.scale_lora_layers = lambda *a, **k: None
    utils.unscale_lora_layers = lambda *a, **k: None

    log_mod = _mod("diffusers.utils.logging")
    log_mod.get_logger = lambda name=None: _pylogging.getLogger(name)
    utils.logging = log_mod

    tu.maybe_allow_in_graph = lambda cls: cls
    tu.is_torch_version = is_torch_version

    mo = _mod("diffusers.models.modeling_outputs")

    class Transformer2DModelOutput:
        def __init__(self, sample):
            self.sample = sample

    mo.Transformer2DModelOutput = Transformer2DModelOutput
    models_pkg.modeling_outputs = mo

    ip = _mod("diffusers.image_processor")

    class IPAdapterMaskProcessor:
        pass

    ip.IPAdapterMaskProcessor = IPAdapterMaskProcessor
    diffusers.image_processor = ip

    iu = _mod("diffusers.utils.import_utils")
    iu.is_torch_npu_available = lambda: False
    iu.is_xformers_available = lambda: False
    utils.import_utils = iu

    if "xformers" not in sys.modules:
        xf = _mod("xformers")
        xf.ops = _mod("xformers.ops")

    diffusers.configuration_utils = cfg
    diffusers.utils = utils
    diffusers.schedulers = sched_pkg
    diffusers.models = models_pkg
    diffusers.ConfigMixin = ConfigMixin


def load_reference_module(rel_path: str, name: str) -> types.ModuleType:
    """Import one reference source file standalone (skips longvgen/__init__)."""
    install()
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, f"{REFERENCE_ROOT}/{rel_path}")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def install_longvgen_alias() -> None:
    """Expose `longvgen.models.embeddings` so reference modules that import it
    absolutely (e.g. video_ipadapter/resampler.py) load without the package
    __init__ chain."""
    if "longvgen.models.embeddings" in sys.modules:
        return
    emb = load_reference_module("longvgen/models/embeddings.py", "ref_embeddings")
    _mod("longvgen")
    _mod("longvgen.models")
    sys.modules["longvgen.models.embeddings"] = emb


def load_reference_transformer() -> types.ModuleType:
    """Import the reference CogVideoX transformer (+ its normalization and
    attention_processor dependency modules) as numerical oracle."""
    install_longvgen_alias()
    load_reference_module(
        "longvgen/models/normalization.py", "longvgen.models.normalization")
    load_reference_module(
        "longvgen/models/attention_processor.py", "longvgen.models.attention_processor")
    return load_reference_module(
        "longvgen/models/cogvideox_transformer_3d.py", "ref_transformer")


def _install_vae_extras() -> None:
    """Shim modules the reference VAE imports beyond the transformer set.

    `CogVideoXDownsample3D` / `CogVideoXUpsample3D` / `DiagonalGaussianDistribution`
    must be numerically REAL (they sit on the VAE compute path); they are
    re-implemented here to the published diffusers-0.31 semantics the reference
    was written against (`autoencoder_kl_cogvideox.py:28-32`)."""
    import diffusers  # installed by install()

    if hasattr(sys.modules["diffusers.models"], "downsampling"):
        return
    import torch
    import torch.nn.functional as F

    sfm = _mod("diffusers.loaders.single_file_model")

    class FromOriginalModelMixin:
        pass

    sfm.FromOriginalModelMixin = FromOriginalModelMixin
    sys.modules["diffusers.loaders"].single_file_model = sfm

    au = _mod("diffusers.utils.accelerate_utils")
    au.apply_forward_hook = lambda fn: fn
    sys.modules["diffusers.utils"].accelerate_utils = au

    down = _mod("diffusers.models.downsampling")

    class CogVideoXDownsample3D(torch.nn.Module):
        # diffusers CogVideoXDownsample3D: optional temporal avg-pool-2
        # (first frame kept when odd), then per-frame 3x3 stride-2 conv with
        # (0,1,0,1) right/bottom zero pad
        def __init__(self, in_channels, out_channels, kernel_size=3, stride=2,
                     padding=0, compress_time=False):
            super().__init__()
            self.conv = torch.nn.Conv2d(in_channels, out_channels, kernel_size,
                                        stride=stride, padding=padding)
            self.compress_time = compress_time

        def forward(self, x):
            if self.compress_time:
                b, c, t, h, w = x.shape
                x = x.permute(0, 3, 4, 1, 2).reshape(b * h * w, c, t)
                if x.shape[-1] % 2 == 1:
                    x_first, x_rest = x[..., 0], x[..., 1:]
                    if x_rest.shape[-1] > 0:
                        x_rest = F.avg_pool1d(x_rest, kernel_size=2, stride=2)
                    x = torch.cat([x_first[..., None], x_rest], dim=-1)
                else:
                    x = F.avg_pool1d(x, kernel_size=2, stride=2)
                x = x.reshape(b, h, w, c, x.shape[-1]).permute(0, 3, 4, 1, 2)
            x = F.pad(x, (0, 1, 0, 1), mode="constant", value=0)
            b, c, t, h, w = x.shape
            x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            x = self.conv(x)
            x = x.reshape(b, t, x.shape[1], x.shape[2], x.shape[3]).permute(0, 2, 1, 3, 4)
            return x

    down.CogVideoXDownsample3D = CogVideoXDownsample3D
    sys.modules["diffusers.models"].downsampling = down

    up = _mod("diffusers.models.upsampling")

    class CogVideoXUpsample3D(torch.nn.Module):
        # diffusers CogVideoXUpsample3D: nearest x2 upsample (causal-odd input
        # keeps the first frame temporally single), then per-frame 3x3 conv
        def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                     padding=1, compress_time=False):
            super().__init__()
            self.conv = torch.nn.Conv2d(in_channels, out_channels, kernel_size,
                                        stride=stride, padding=padding)
            self.compress_time = compress_time

        def forward(self, inputs):
            if self.compress_time:
                if inputs.shape[2] > 1 and inputs.shape[2] % 2 == 1:
                    x_first, x_rest = inputs[:, :, 0], inputs[:, :, 1:]
                    x_first = F.interpolate(x_first, scale_factor=2.0)
                    x_rest = F.interpolate(x_rest, scale_factor=2.0)
                    x_first = x_first[:, :, None, :, :]
                    inputs = torch.cat([x_first, x_rest], dim=2)
                elif inputs.shape[2] > 1:
                    inputs = F.interpolate(inputs, scale_factor=2.0)
                else:
                    inputs = inputs.squeeze(2)
                    inputs = F.interpolate(inputs, scale_factor=2.0)
                    inputs = inputs[:, :, None, :, :]
            else:
                b, c, t, h, w = inputs.shape
                inputs = inputs.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
                inputs = F.interpolate(inputs, scale_factor=2.0)
                inputs = inputs.reshape(b, t, *inputs.shape[1:]).permute(0, 2, 1, 3, 4)

            b, c, t, h, w = inputs.shape
            inputs = inputs.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            inputs = self.conv(inputs)
            inputs = inputs.reshape(b, t, *inputs.shape[1:]).permute(0, 2, 1, 3, 4)
            return inputs

    up.CogVideoXUpsample3D = CogVideoXUpsample3D
    sys.modules["diffusers.models"].upsampling = up

    mo = sys.modules["diffusers.models.modeling_outputs"]

    class AutoencoderKLOutput:
        def __init__(self, latent_dist):
            self.latent_dist = latent_dist

    mo.AutoencoderKLOutput = AutoencoderKLOutput

    vae_mod = _mod("diffusers.models.autoencoders.vae")
    _mod("diffusers.models.autoencoders").vae = vae_mod

    class DecoderOutput:
        def __init__(self, sample, commit_loss=None):
            self.sample = sample
            self.commit_loss = commit_loss

    class DiagonalGaussianDistribution:
        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
            self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
            self.deterministic = deterministic
            self.std = torch.exp(0.5 * self.logvar)

        def sample(self, generator=None):
            from diffusers.utils.torch_utils import randn_tensor

            noise = randn_tensor(self.mean.shape, generator=generator,
                                 device=self.mean.device, dtype=self.mean.dtype)
            return self.mean + self.std * noise

        def mode(self):
            return self.mean

    vae_mod.DecoderOutput = DecoderOutput
    vae_mod.DiagonalGaussianDistribution = DiagonalGaussianDistribution


def load_reference_vae() -> types.ModuleType:
    """Import the reference 3D causal VAE (`autoencoder_kl_cogvideox.py`) as
    numerical oracle."""
    install()
    _install_vae_extras()
    return load_reference_module(
        "longvgen/models/autoencoder_kl_cogvideox.py", "ref_vae")

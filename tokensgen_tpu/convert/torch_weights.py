"""Torch/diffusers checkpoint -> flax param tree converters.

Imports the reference's artifact layout (SURVEY §5.4: `weights/CogVideoX-5b` +
`TokensGen-To2V/{vip.pt, resampler/, mean.pt, std.pt, pca.pt}` +
`TokensGen-T2To/transformer`) into this framework's parameter trees.

Conventions:
* torch Linear weight [out, in] -> flax Dense kernel [in, out],
* torch Conv2d [O, I, kh, kw] -> flax Conv kernel [kh, kw, I, O]; Conv3d
  [O, I, kt, kh, kw] -> [kt, kh, kw, I, O],
* torch LayerNorm weight/bias -> scale/bias (our `LayerNorm`),
* per-block diffusers names (`transformer_blocks.{i}.*`) are stacked along a
  leading layer axis to match the `nn.scan` parameter layout.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from tokensgen_tpu.models.dit import DiTConfig


def _lin(sd: Dict[str, np.ndarray], name: str, bias: bool = True):
    out = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _ln(sd, name):
    out = {}
    if f"{name}.weight" in sd:
        out["scale"] = sd[f"{name}.weight"]
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv2d(sd, name):
    w = sd[f"{name}.weight"]  # [O, I, kh, kw]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv3d(sd, name):
    w = sd[f"{name}.weight"]  # [O, I, kt, kh, kw]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _stack(dicts):
    """List of per-layer param dicts -> one dict with leading layer axis."""
    out = {}
    for key in dicts[0]:
        if isinstance(dicts[0][key], dict):
            out[key] = _stack([d[key] for d in dicts])
        else:
            out[key] = np.stack([d[key] for d in dicts])
    return out


def convert_dit(sd: Dict[str, np.ndarray], config: DiTConfig) -> Dict:
    """diffusers `CogVideoXTransformer3DModel` state dict (+ optional grafted
    vip entries from `vip.pt`) -> our `CogVideoXTransformer` params."""
    p = {}
    p["text_proj"] = _lin(sd, "patch_embed.text_proj")
    if config.use_output_projection:
        p["patch_proj"] = _conv2d(sd, "patch_embed.proj")
    elif "patch_embed.proj.weight" in sd and sd["patch_embed.proj.weight"].ndim == 2:
        p["patch_proj_dense"] = _lin(sd, "patch_embed.proj")
    if config.vip is not None and "patch_embed.vip_proj.weight" in sd:
        p["vip_proj"] = _lin(sd, "patch_embed.vip_proj")

    p["time_embedding"] = {
        "linear_1": _lin(sd, "time_embedding.linear_1"),
        "linear_2": _lin(sd, "time_embedding.linear_2"),
    }

    blocks = []
    for i in range(config.num_layers):
        pre = f"transformer_blocks.{i}"
        blk = {
            "norm1": {"linear": _lin(sd, f"{pre}.norm1.linear"),
                      "norm": _ln(sd, f"{pre}.norm1.norm")},
            "norm2": {"linear": _lin(sd, f"{pre}.norm2.linear"),
                      "norm": _ln(sd, f"{pre}.norm2.norm")},
            "attn1": {
                "to_q": _lin(sd, f"{pre}.attn1.to_q"),
                "to_k": _lin(sd, f"{pre}.attn1.to_k"),
                "to_v": _lin(sd, f"{pre}.attn1.to_v"),
                "to_out": _lin(sd, f"{pre}.attn1.to_out.0"),
                "norm_q": {"ln": _ln(sd, f"{pre}.attn1.norm_q")},
                "norm_k": {"ln": _ln(sd, f"{pre}.attn1.norm_k")},
            },
            "ff": {
                "net_0_proj": _lin(sd, f"{pre}.ff.net.0.proj"),
                "net_2": _lin(sd, f"{pre}.ff.net.2"),
            },
        }
        if config.vip is not None:
            # func_type "3" grafts no vip AdaLN (the vip stream passes through
            # blocks unchanged); "4" adds the autoregressive-stream AdaLNs
            # (`cogvideox_transformer_3d.py:158-191`)
            if config.vip.func_type in ("1", "2", "4"):
                blk["vip_norm1"] = {"linear": _lin(sd, f"{pre}.vip_norm1.linear"),
                                    "norm": _ln(sd, f"{pre}.vip_norm1.norm")}
                blk["vip_norm2"] = {"linear": _lin(sd, f"{pre}.vip_norm2.linear"),
                                    "norm": _ln(sd, f"{pre}.vip_norm2.norm")}
            if config.vip.func_type == "4":
                blk["ar_norm1"] = {"linear": _lin(sd, f"{pre}.ar_norm1.linear"),
                                   "norm": _ln(sd, f"{pre}.ar_norm1.norm")}
                blk["ar_norm2"] = {"linear": _lin(sd, f"{pre}.ar_norm2.linear"),
                                   "norm": _ln(sd, f"{pre}.ar_norm2.norm")}
            blk["attn1"].update({
                "vip_to_q": _lin(sd, f"{pre}.attn1.processor.vip_to_q"),
                "vip_to_k": _lin(sd, f"{pre}.attn1.processor.vip_to_k"),
                "vip_to_v": _lin(sd, f"{pre}.attn1.processor.vip_to_v"),
                "vip_norm_q": {"ln": _ln(sd, f"{pre}.attn1.processor.vip_norm_q")},
                "vip_norm_k": {"ln": _ln(sd, f"{pre}.attn1.processor.vip_norm_k")},
            })
        blocks.append(blk)
    p["blocks"] = _stack(blocks)

    p["norm_final"] = _ln(sd, "norm_final")
    p["norm_out"] = {"linear": _lin(sd, "norm_out.linear"),
                     "norm": _ln(sd, "norm_out.norm")}
    if config.use_output_projection and "proj_out.weight" in sd:
        p["proj_out"] = _lin(sd, "proj_out")
    return p


def merge_vip_state_dict(base_sd: Dict[str, np.ndarray], vip_sd: Dict[str, np.ndarray]):
    """Overlay `vip.pt` entries onto a base transformer state dict
    (`cogvideox_transformer_3d.py:604-619`)."""
    out = dict(base_sd)
    out.update(vip_sd)
    return out


def convert_resampler(sd: Dict[str, np.ndarray], depth: int) -> Dict:
    """diffusers-format Resampler state dict -> our `Resampler` params
    (`video_ipadapter/resampler.py`; layers.{i}.0 = attention, .1 = feed-forward)."""
    p = {
        "latents": sd["latents"],
        "proj_in": _lin(sd, "proj_in"),
        "proj_out": _lin(sd, "proj_out"),
        "norm_out": _ln(sd, "norm_out"),
    }
    for i in range(depth):
        p[f"layers_{i}_attn"] = {
            "norm1": _ln(sd, f"layers.{i}.0.norm1"),
            "norm2": _ln(sd, f"layers.{i}.0.norm2"),
            "to_q": _lin(sd, f"layers.{i}.0.to_q", bias=False),
            "to_kv": _lin(sd, f"layers.{i}.0.to_kv", bias=False),
            "to_out": _lin(sd, f"layers.{i}.0.to_out", bias=False),
            "norm_q": _ln(sd, f"layers.{i}.0.norm_q"),
            "norm_k": _ln(sd, f"layers.{i}.0.norm_k"),
        }
        p[f"layers_{i}_ff"] = {
            "net_0_proj": _lin(sd, f"layers.{i}.1.net.0.proj"),
            "net_2": _lin(sd, f"layers.{i}.1.net.2"),
        }
    return p


def convert_vae(sd: Dict[str, np.ndarray], config) -> Dict:
    """diffusers `AutoencoderKLCogVideoX` state dict -> our VAE params."""
    n_down = len(config.block_out_channels)

    def causal(name):
        return {"conv": _conv3d(sd, f"{name}.conv")}

    def gn(name):
        return {"GroupNorm_0": _ln(sd, name)}

    def spatial(name):
        return {
            "norm_layer": gn(f"{name}.norm_layer"),
            "conv_y": causal(f"{name}.conv_y"),
            "conv_b": causal(f"{name}.conv_b"),
        }

    def resnet(name, use_spatial):
        out = {
            "conv1": causal(f"{name}.conv1"),
            "conv2": causal(f"{name}.conv2"),
        }
        if use_spatial:
            out["norm1"] = spatial(f"{name}.norm1")
            out["norm2"] = spatial(f"{name}.norm2")
        else:
            out["norm1"] = gn(f"{name}.norm1")
            out["norm2"] = gn(f"{name}.norm2")
        if f"{name}.conv_shortcut.weight" in sd:
            out["conv_shortcut"] = _conv3d(sd, f"{name}.conv_shortcut")
        return out

    enc = {"conv_in": causal("encoder.conv_in"),
           "norm_out": gn("encoder.norm_out"),
           "conv_out": causal("encoder.conv_out")}
    for i in range(n_down):
        for j in range(config.layers_per_block):
            enc[f"down_{i}_res_{j}"] = resnet(
                f"encoder.down_blocks.{i}.resnets.{j}", use_spatial=False)
        if i < n_down - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv2d_as_133(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    for j in range(2):
        enc[f"mid_res_{j}"] = resnet(f"encoder.mid_block.resnets.{j}", use_spatial=False)

    dec = {"conv_in": causal("decoder.conv_in"),
           "norm_out": spatial("decoder.norm_out"),
           "conv_out": causal("decoder.conv_out")}
    for j in range(2):
        dec[f"mid_res_{j}"] = resnet(f"decoder.mid_block.resnets.{j}", use_spatial=True)
    for i in range(n_down):
        for j in range(config.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = resnet(
                f"decoder.up_blocks.{i}.resnets.{j}", use_spatial=True)
        if i < n_down - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv2d_as_133(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }
    return {"encoder": enc, "decoder": dec}


def _conv2d_as_133(sd, name):
    """torch Conv2d [O, I, 3, 3] -> our (1, 3, 3) 3D conv kernel [1, 3, 3, I, O]."""
    w = sd[f"{name}.weight"]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))[None]}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def convert_t5(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    """HF `T5EncoderModel` state dict -> our `T5Encoder` params."""
    p = {
        "embed": {"embedding": sd["encoder.embed_tokens.weight"]
                  if "encoder.embed_tokens.weight" in sd else sd["shared.weight"]},
        "relative_attention_bias": sd[
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ],
        "final_ln": {"scale": sd["encoder.final_layer_norm.weight"]},
    }
    for i in range(num_layers):
        pre = f"encoder.block.{i}"
        p[f"block_{i}"] = {
            "ln1": {"scale": sd[f"{pre}.layer.0.layer_norm.weight"]},
            "ln2": {"scale": sd[f"{pre}.layer.1.layer_norm.weight"]},
            "attn": {
                "q": _lin(sd, f"{pre}.layer.0.SelfAttention.q", bias=False),
                "k": _lin(sd, f"{pre}.layer.0.SelfAttention.k", bias=False),
                "v": _lin(sd, f"{pre}.layer.0.SelfAttention.v", bias=False),
                "o": _lin(sd, f"{pre}.layer.0.SelfAttention.o", bias=False),
            },
            "wi_0": _lin(sd, f"{pre}.layer.1.DenseReluDense.wi_0", bias=False),
            "wi_1": _lin(sd, f"{pre}.layer.1.DenseReluDense.wi_1", bias=False),
            "wo": _lin(sd, f"{pre}.layer.1.DenseReluDense.wo", bias=False),
        }
    return p


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a .pt/.bin state dict to numpy (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def load_pca_artifact(path: str):
    """`pca.pt` (a pickled torch PCA module) -> `core.pca.PCAState`."""
    import torch
    import jax.numpy as jnp
    from tokensgen_tpu.core.pca import PCAState

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return PCAState(
        mean=jnp.asarray(obj.mean_.float().numpy()),
        components=jnp.asarray(obj.components_.float().numpy()),
    )

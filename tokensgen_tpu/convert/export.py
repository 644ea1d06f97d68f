"""Flax param tree -> reference-format (diffusers-style) state dicts.

The inverse of `convert/torch_weights.py`: lets checkpoints trained here be
saved in the reference's artifact layout — incl. the `vip.pt` split that holds
only the vip_* adapter weights (`cogvideox_transformer_3d.py:624-634`).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from tokensgen_tpu.models.dit import DiTConfig


def _unlin(sd, name, p):
    sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    if "bias" in p:
        sd[f"{name}.bias"] = np.asarray(p["bias"])


def _unln(sd, name, p):
    if "scale" in p:
        sd[f"{name}.weight"] = np.asarray(p["scale"])
    if "bias" in p:
        sd[f"{name}.bias"] = np.asarray(p["bias"])


def _unconv2d(sd, name, p):
    sd[f"{name}.weight"] = np.ascontiguousarray(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
    )
    if "bias" in p:
        sd[f"{name}.bias"] = np.asarray(p["bias"])


def _layer(tree, i):
    return {k: _layer(v, i) if isinstance(v, dict) else np.asarray(v)[i]
            for k, v in tree.items()}


def export_dit(params: Dict, config: DiTConfig) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    _unlin(sd, "patch_embed.text_proj", params["text_proj"])
    if "patch_proj" in params:
        _unconv2d(sd, "patch_embed.proj", params["patch_proj"])
    if "patch_proj_dense" in params:
        _unlin(sd, "patch_embed.proj", params["patch_proj_dense"])
    if "vip_proj" in params:
        _unlin(sd, "patch_embed.vip_proj", params["vip_proj"])
    _unlin(sd, "time_embedding.linear_1", params["time_embedding"]["linear_1"])
    _unlin(sd, "time_embedding.linear_2", params["time_embedding"]["linear_2"])

    for i in range(config.num_layers):
        blk = _layer(params["blocks"], i)
        pre = f"transformer_blocks.{i}"
        _unlin(sd, f"{pre}.norm1.linear", blk["norm1"]["linear"])
        _unln(sd, f"{pre}.norm1.norm", blk["norm1"]["norm"])
        _unlin(sd, f"{pre}.norm2.linear", blk["norm2"]["linear"])
        _unln(sd, f"{pre}.norm2.norm", blk["norm2"]["norm"])
        at = blk["attn1"]
        _unlin(sd, f"{pre}.attn1.to_q", at["to_q"])
        _unlin(sd, f"{pre}.attn1.to_k", at["to_k"])
        _unlin(sd, f"{pre}.attn1.to_v", at["to_v"])
        _unlin(sd, f"{pre}.attn1.to_out.0", at["to_out"])
        _unln(sd, f"{pre}.attn1.norm_q", at["norm_q"]["ln"])
        _unln(sd, f"{pre}.attn1.norm_k", at["norm_k"]["ln"])
        _unlin(sd, f"{pre}.ff.net.0.proj", blk["ff"]["net_0_proj"])
        _unlin(sd, f"{pre}.ff.net.2", blk["ff"]["net_2"])
        if config.vip is not None and "vip_norm1" in blk:
            _unlin(sd, f"{pre}.vip_norm1.linear", blk["vip_norm1"]["linear"])
            _unln(sd, f"{pre}.vip_norm1.norm", blk["vip_norm1"]["norm"])
            _unlin(sd, f"{pre}.vip_norm2.linear", blk["vip_norm2"]["linear"])
            _unln(sd, f"{pre}.vip_norm2.norm", blk["vip_norm2"]["norm"])
            _unlin(sd, f"{pre}.attn1.processor.vip_to_q", at["vip_to_q"])
            _unlin(sd, f"{pre}.attn1.processor.vip_to_k", at["vip_to_k"])
            _unlin(sd, f"{pre}.attn1.processor.vip_to_v", at["vip_to_v"])
            _unln(sd, f"{pre}.attn1.processor.vip_norm_q", at["vip_norm_q"]["ln"])
            _unln(sd, f"{pre}.attn1.processor.vip_norm_k", at["vip_norm_k"]["ln"])

    _unln(sd, "norm_final", params["norm_final"])
    _unlin(sd, "norm_out.linear", params["norm_out"]["linear"])
    _unln(sd, "norm_out.norm", params["norm_out"]["norm"])
    if "proj_out" in params:
        _unlin(sd, "proj_out", params["proj_out"])
    return sd


def export_vip_only(params: Dict, config: DiTConfig) -> Dict[str, np.ndarray]:
    """The `vip.pt` artifact: only names containing 'vip_'
    (`cogvideox_transformer_3d.py:624-634`)."""
    full = export_dit(params, config)
    return {k: v for k, v in full.items() if "vip_" in k}


def export_resampler(params: Dict, depth: int) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    sd["latents"] = np.asarray(params["latents"])
    _unlin(sd, "proj_in", params["proj_in"])
    _unlin(sd, "proj_out", params["proj_out"])
    _unln(sd, "norm_out", params["norm_out"])
    for i in range(depth):
        at = params[f"layers_{i}_attn"]
        _unln(sd, f"layers.{i}.0.norm1", at["norm1"])
        _unln(sd, f"layers.{i}.0.norm2", at["norm2"])
        _unlin(sd, f"layers.{i}.0.to_q", at["to_q"])
        _unlin(sd, f"layers.{i}.0.to_kv", at["to_kv"])
        _unlin(sd, f"layers.{i}.0.to_out", at["to_out"])
        _unln(sd, f"layers.{i}.0.norm_q", at["norm_q"])
        _unln(sd, f"layers.{i}.0.norm_k", at["norm_k"])
        ff = params[f"layers_{i}_ff"]
        _unlin(sd, f"layers.{i}.1.net.0.proj", ff["net_0_proj"])
        _unlin(sd, f"layers.{i}.1.net.2", ff["net_2"])
    return sd

"""Checkpoint/resume (orbax) with the reference's logical artifact split.

Reference behavior (SURVEY §5.4, `train_cogvideo_to2v.py:1346-1434,1674-1700`):
* periodic `checkpoint-{step}` dirs holding the trainable split (vip adapter /
  resampler / full transformer when trainable) + optimizer state,
* rotation keeping `checkpoints_total_limit`,
* resume discovers the latest dir and restores optimizer/step.

Here: one orbax PyTree checkpoint per step dir, plus `export_reference_artifacts`
writing the torch-layout `vip.pt`-style split (as .safetensors) for
interoperability with the reference tooling.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import numpy as np


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(root, f"checkpoint-{step}")


def save_checkpoint(
    root: str,
    step: int,
    state: Dict[str, Any],
    total_limit: Optional[int] = None,
) -> str:
    """Save {params, opt_state, ...} under checkpoint-{step}; rotate old ones."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(_ckpt_dir(root, step))
    if os.path.exists(path):
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state)

    if total_limit is not None:
        steps = sorted(list_checkpoints(root))
        for old in steps[:-total_limit]:
            shutil.rmtree(_ckpt_dir(root, old), ignore_errors=True)
    return path


def list_checkpoints(root: str):
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_checkpoint(root: str) -> Optional[int]:
    steps = list_checkpoints(root)
    return steps[-1] if steps else None


def restore_checkpoint(root: str, step: Optional[int] = None,
                       target: Optional[Dict[str, Any]] = None):
    """Restore (state, step); step defaults to the latest
    (`train_cogvideo_to2v.py:1674-1700` "latest" discovery)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_checkpoint(root)
        if step is None:
            return None, None
    path = os.path.abspath(_ckpt_dir(root, step))
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            restored = ckptr.restore(path, item=target)
        else:
            restored = ckptr.restore(path)
    return restored, step


def export_reference_artifacts(
    out_dir: str,
    dit_params=None,
    dit_config=None,
    resampler_params=None,
    resampler_depth: Optional[int] = None,
    pca=None,
    token_mean=None,
    token_std=None,
) -> None:
    """Write the reference artifact layout (`weights/TokensGen-To2V/{vip
    .safetensors, resampler/, mean.npy, std.npy, pca/}`) from our params."""
    from tokensgen_tpu.convert.export import export_resampler, export_vip_only
    from tokensgen_tpu.convert.safetensors_io import save_safetensors

    os.makedirs(out_dir, exist_ok=True)
    if dit_params is not None:
        vip_sd = export_vip_only(dit_params, dit_config)
        save_safetensors(os.path.join(out_dir, "vip.safetensors"),
                         {k: np.asarray(v, np.float32) for k, v in vip_sd.items()})
    if resampler_params is not None:
        rs_dir = os.path.join(out_dir, "resampler")
        os.makedirs(rs_dir, exist_ok=True)
        rs_sd = export_resampler(resampler_params, resampler_depth)
        save_safetensors(
            os.path.join(rs_dir, "diffusion_flax_model.safetensors"),
            {k: np.asarray(v, np.float32) for k, v in rs_sd.items()},
        )
    if pca is not None:
        save_safetensors(os.path.join(out_dir, "pca.safetensors"), {
            "mean_": np.asarray(pca.mean, np.float32),
            "components_": np.asarray(pca.components, np.float32),
        })
    if token_mean is not None:
        np.save(os.path.join(out_dir, "mean.npy"), np.asarray(token_mean))
    if token_std is not None:
        np.save(os.path.join(out_dir, "std.npy"), np.asarray(token_std))

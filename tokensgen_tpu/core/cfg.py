"""Classifier-free-guidance math (pure functions).

Matches the reference pipelines (`/root/reference/longvgen/pipeline/
pipeline_cogvideox_mp_fifo.py:1253-1266` and the per-frame dynamic variant in
`longvgen/fifo_sampling/cogvideo_sampling_mp_fifo.py:518-533`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def dynamic_scale_table(
    guidance_scale: float, num_inference_steps: int, num_train_timesteps: int = 1000
) -> "np.ndarray":
    """[T] host-side table of the CogVideoX dynamic CFG ramp over raw timesteps.

    ``1 + g·(1 - cos(π·((steps - t)/steps)^5))/2`` — the reference feeds the 0..999
    timestep (not the step index) into a formula normalised by the number of
    inference steps, so the cos argument can reach ~1e7; float64 is required for
    parity with the reference's host-python math, hence a precomputed table that
    jitted samplers gather from.
    """
    t = np.arange(num_train_timesteps, dtype=np.float64)
    ratio = (num_inference_steps - t) / num_inference_steps
    return (1.0 + guidance_scale * (1.0 - np.cos(np.pi * ratio**5.0)) / 2.0).astype(
        np.float32
    )


def dynamic_scale(
    guidance_scale: float, t: jnp.ndarray, num_inference_steps: int
) -> jnp.ndarray:
    """Dynamic CFG scale at (vector) timestep ``t`` via the float64 host table."""
    table = jnp.asarray(dynamic_scale_table(guidance_scale, num_inference_steps))
    return table[t]


def combine(
    noise_pred: jnp.ndarray,
    guidance_scale: jnp.ndarray | float,
    guidance_scale_img: Optional[jnp.ndarray | float] = None,
    use_separate_guidance: bool = False,
) -> jnp.ndarray:
    """Collapse a CFG-batched prediction ([2B or 3B, ...]) to [B, ...].

    2-way: ``uncond + g·(text - uncond)``.
    3-way (``use_separate_guidance``): batch is [uncond_txt, uncond_img, txt_img]
    and the combine is ``ti + (g-1)·(ti - u_txt) + (g_img-1)·(ti - u_img)``.
    ``guidance_scale`` may be a scalar or a per-frame array broadcastable against
    the trailing dims (the FIFO engine passes [F] for per-frame dynamic CFG).
    """
    if use_separate_guidance:
        u_txt, u_img, ti = jnp.split(noise_pred, 3, axis=0)
        g = _expand(guidance_scale, ti)
        gi = _expand(guidance_scale_img, ti)
        return ti + (g - 1.0) * (ti - u_txt) + (gi - 1.0) * (ti - u_img)
    uncond, text = jnp.split(noise_pred, 2, axis=0)
    g = _expand(guidance_scale, text)
    return uncond + g * (text - uncond)


def _expand(scale, like: jnp.ndarray) -> jnp.ndarray:
    scale = jnp.asarray(scale, dtype=like.dtype)
    if scale.ndim == 0:
        return scale
    # per-frame scale [F] -> [1, F, 1, 1, 1] against [B, F, C, H, W]
    return scale.reshape((1,) + scale.shape + (1,) * (like.ndim - scale.ndim - 1))


def batch_for_cfg(
    latents: jnp.ndarray, do_cfg: bool, use_separate_guidance: bool = False
) -> jnp.ndarray:
    """Tile latents along batch for the CFG forward ([B]->[2B] or [3B])."""
    if not do_cfg:
        return latents
    n = 3 if use_separate_guidance else 2
    return jnp.concatenate([latents] * n, axis=0)

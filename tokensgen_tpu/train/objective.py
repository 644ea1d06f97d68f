"""Training objective + timestep sampling for To2V / T2To.

Parity targets:
* loss — v-prediction evaluated in x0 space with per-timestep weight 1/(1-ᾱ):
  `model_pred = get_velocity(model_output, noisy, t)` (which algebraically equals
  the x0 estimate), `target = clean input`, per-sample mean then batch mean
  (`/root/reference/train_cogvideo_to2v.py:1995-2004`,
  `train_cogvideo_t2to.py:2125-2161` adds a per-element loss mask for padded
  chunks).
* timestep regimes (`train_cogvideo_to2v.py:1773-1818`):
  - FIFO-style ramped per-frame timesteps (`diff_timesteps_ratio` branch):
    base t ~ U[0, T - interv·(F-1)), per-frame linspace ramp with
    interv = (T-1)/(inference_steps-1),
  - explicit uniform sampling stratified by process index — here the process
    index is the mesh ``data`` axis index, folded in via `jax.lax.axis_index`
    or passed explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tokensgen_tpu.core import schedule as S


def x0_weighted_loss(
    sched: S.DiffusionSchedule,
    model_output: jnp.ndarray,  # [B, F, C, H, W]
    noisy_input: jnp.ndarray,
    clean_input: jnp.ndarray,
    timesteps: jnp.ndarray,  # [B] or [B, F]
    loss_mask: Optional[jnp.ndarray] = None,  # broadcastable to model_output
) -> jnp.ndarray:
    """Scalar loss: mean_b[ mean_elems( w·(x0_pred − x0)² ) ]."""
    x0_pred = S.get_velocity(sched, model_output, noisy_input, timesteps)
    ap = sched.alphas_cumprod[jnp.clip(timesteps, 0, sched.config.num_train_timesteps - 1)]
    w = 1.0 / (1.0 - ap)
    w = w.reshape(w.shape + (1,) * (model_output.ndim - w.ndim))
    sq = w * (x0_pred - clean_input) ** 2
    b = model_output.shape[0]
    if loss_mask is not None:
        mask = jnp.broadcast_to(loss_mask, sq.shape).astype(sq.dtype)
        per_sample = jnp.sum((sq * mask).reshape(b, -1), axis=1) / jnp.maximum(
            jnp.sum(mask.reshape(b, -1), axis=1), 1.0
        )
    else:
        per_sample = jnp.mean(sq.reshape(b, -1), axis=1)
    return jnp.mean(per_sample)


def sample_uniform_timesteps(
    rng: jax.Array,
    batch: int,
    num_train_timesteps: int = 1000,
    process_index: Optional[jnp.ndarray] = None,
    num_processes: int = 1,
) -> jnp.ndarray:
    """[B] timesteps; optionally stratified by data-parallel rank
    (`train_cogvideo_to2v.py:1797-1818`)."""
    if process_index is None or num_processes <= 1:
        return jax.random.randint(rng, (batch,), 0, num_train_timesteps)
    interval = num_train_timesteps // num_processes
    shift = num_train_timesteps % interval if interval > 0 else 0
    lo = jnp.where(process_index == 0, 0, process_index * interval + shift)
    hi = jnp.where(process_index == 0, interval + shift, (process_index + 1) * interval + shift)
    u = jax.random.uniform(rng, (batch,))
    return (lo + u * (hi - lo)).astype(jnp.int32)


def sample_fifo_ramp_timesteps(
    rng: jax.Array,
    batch: int,
    num_frames: int,
    num_train_timesteps: int = 1000,
    inference_timesteps: int = 52,
) -> jnp.ndarray:
    """[B, F] ramped per-frame timesteps (`train_cogvideo_to2v.py:1773-1795`)."""
    interv = (num_train_timesteps - 1) / (inference_timesteps - 1)
    hi = int(num_train_timesteps - interv * (num_frames - 1))
    base = jax.random.randint(rng, (batch,), 0, hi).astype(jnp.float32)
    end = jnp.round(base + interv * (num_frames - 1))
    frac = jnp.linspace(0.0, 1.0, num_frames)
    ramp = base[:, None] + frac[None, :] * (end - base)[:, None]
    return jnp.clip(jnp.round(ramp), 0, num_train_timesteps - 1).astype(jnp.int32)

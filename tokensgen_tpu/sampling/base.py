"""Base (per-clip) denoising loop as a jitted `lax.scan`.

Replaces the Python step loop of the reference pipelines
(`/root/reference/longvgen/pipeline/pipeline_cogvideox_mp_fifo.py:1183-1305`,
`pipeline_cogvideox_t2to.py:822-889`) with a single compiled scan:

* CFG batching (2-way or 3-way separate guidance) + optional dynamic CFG (gathered
  from a float64 host table, see `core/cfg.py`),
* DPM-Solver++(2M) or DDIM steps with explicit (t, prev_t, t_back) vectors,
* optional FIFO seed collection: before step i the frame at index
  ``max(0, F-1-i)`` of the latents (and the previous step's x0) is snapshotted —
  exactly the queue-seed recording of the reference (`:1190-1194`). The snapshots
  are returned newest-first (list-prepend order), i.e. index 0 is the cleanest.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tokensgen_tpu.core import cfg as cfg_lib
from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.utils import debug


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_inference_steps: int = 52
    guidance_scale: float = 6.0
    guidance_scale_img: float = 1.5
    use_dynamic_cfg: bool = False
    use_separate_guidance: bool = False
    do_classifier_free_guidance: bool = True
    scheduler: str = "dpm"  # "dpm" | "ddim"
    stochastic: bool = True  # draw DPM noise (reference default); False = deterministic
    collect_fifo: bool = False
    # parity option: the reference casts latents back to the network dtype after
    # every scheduler step (`pipeline_cogvideox_mp_fifo.py:1290`); None keeps f32
    latents_round_trip_dtype: Optional[str] = None


class DenoiseResult(NamedTuple):
    latents: jnp.ndarray  # [B, F, C, H, W] final clean latents
    fifo_latents: Optional[jnp.ndarray]  # [B, steps, C, H, W] queue seed (cleanest first)
    fifo_old_x0: Optional[jnp.ndarray]  # [B, steps, C, H, W]
    fifo_old_valid: Optional[jnp.ndarray]  # [steps] bool


def denoise(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: S.DiffusionSchedule,
    scfg: SamplerConfig,
    latents: jnp.ndarray,  # [B, F, C, H, W]
    rng: Optional[jax.Array] = None,
    host_loop: bool = False,
    model_consts=None,
) -> DenoiseResult:
    """Run the full denoise loop.

    ``model_fn(latents_cfg_batched, timestep_vec) -> noise_pred`` must already
    close over text/vip conditioning and CFG-batch its conditioning to match
    (uncond first, as the reference's `encode_prompt` concatenates
    [negative, positive]). ``timestep_vec`` is [nB] (one shared t per step).
    Returns float32 latents; model output is cast to float32 before guidance, as
    the reference does (`pipeline_cogvideox_mp_fifo.py:1247`).

    ``host_loop=True`` dispatches one jitted program per denoise step instead
    of a single lax.scan — same numerics; bounds per-execution wall time on
    runtimes that cap it (the tunneled single-chip path).

    ``model_consts``: optional pytree of model state (params, conditioning);
    when given, the model is called as ``model_fn(model_consts, lat, tvec)``
    and the tree rides as a traced ARGUMENT of the per-step program. Required
    with ``host_loop`` for any real model — a closed-over param tree would be
    baked into the lowered HLO as constants (multi-GB uploads on remote
    runtimes).
    """
    ts = np.asarray(S.inference_timesteps(sched.config, scfg.num_inference_steps))
    n = len(ts)
    prev_ts = np.concatenate([ts[1:], [-1]])
    back_ts = np.concatenate([[-1], ts[:-1]])  # -1 => no history (first step)
    f = latents.shape[1]

    if scfg.use_dynamic_cfg:
        g_table = jnp.asarray(
            cfg_lib.dynamic_scale_table(scfg.guidance_scale, n, sched.config.num_train_timesteps))
        gi_table = jnp.asarray(
            cfg_lib.dynamic_scale_table(scfg.guidance_scale_img, n, sched.config.num_train_timesteps))
    else:
        g_table = gi_table = None

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(mc, carry, inp):
        latents, old_x0, old_valid = carry
        t, prev_t, back_t, idx, key = inp

        snap_idx = jnp.maximum(0, f - 1 - idx)
        snap_lat = jax.lax.dynamic_slice_in_dim(latents, snap_idx, 1, axis=1)[:, 0]
        snap_x0 = jax.lax.dynamic_slice_in_dim(old_x0, snap_idx, 1, axis=1)[:, 0]
        snap_valid = old_valid

        b = latents.shape[0]
        lat_in = cfg_lib.batch_for_cfg(
            latents, scfg.do_classifier_free_guidance, scfg.use_separate_guidance
        )
        tvec = jnp.full((lat_in.shape[0],), t, dtype=jnp.int32)
        if model_consts is not None:
            noise_pred = model_fn(mc, lat_in, tvec).astype(jnp.float32)
        else:
            noise_pred = model_fn(lat_in, tvec).astype(jnp.float32)
        noise_pred = debug.stats("noise_pred", noise_pred)

        if scfg.do_classifier_free_guidance:
            g = g_table[t] if g_table is not None else scfg.guidance_scale
            gi = gi_table[t] if gi_table is not None else scfg.guidance_scale_img
            noise_pred = cfg_lib.combine(noise_pred, g, gi, scfg.use_separate_guidance)

        tb = jnp.full((b,), t, dtype=jnp.int32)
        pb = jnp.full((b,), prev_t, dtype=jnp.int32)
        kb = jnp.full((b,), back_t, dtype=jnp.int32)
        if scfg.scheduler == "ddim":
            new_latents, x0 = S.ddim_step(sched, noise_pred, latents, tb, pb)
        else:
            noise = (
                jax.random.normal(key, latents.shape, dtype=jnp.float32)
                if scfg.stochastic else None
            )
            noise2 = (
                jax.random.normal(jax.random.fold_in(key, 1), latents.shape, jnp.float32)
                if scfg.stochastic else None
            )
            new_latents, x0 = S.dpm_step(
                sched, noise_pred, latents, tb, pb,
                t_back=kb, old_pred_original_sample=old_x0,
                old_valid=jnp.full((b,), old_valid),
                noise=noise, noise2=noise2,
            )
        if scfg.latents_round_trip_dtype is not None:
            dt = jnp.dtype(scfg.latents_round_trip_dtype)
            new_latents = new_latents.astype(dt).astype(jnp.float32)
            x0 = x0.astype(dt).astype(jnp.float32)
        return (new_latents, x0, jnp.asarray(True)), (snap_lat, snap_x0, snap_valid)

    keys = jax.random.split(rng, n)
    inputs = (
        jnp.asarray(ts), jnp.asarray(prev_ts), jnp.asarray(back_ts),
        jnp.arange(n), keys,
    )
    init = (latents.astype(jnp.float32), jnp.zeros_like(latents, jnp.float32),
            jnp.asarray(False))
    if host_loop:
        step_fn = jax.jit(step, donate_argnums=(1,))
        # donation would invalidate the caller's latents buffer when astype
        # was a no-op alias — copy the first carry
        carry = (jnp.array(init[0], copy=True), init[1], init[2])
        sn_l, sn_x, sn_v = [], [], []
        for i in range(n):
            carry, (sl, sx, sv) = step_fn(
                model_consts, carry,
                (jnp.asarray(ts[i]), jnp.asarray(prev_ts[i]),
                 jnp.asarray(back_ts[i]), jnp.asarray(i, jnp.int32), keys[i]))
            sn_l.append(sl)
            sn_x.append(sx)
            sn_v.append(sv)
        final = carry[0]
        snaps = jnp.stack(sn_l)
        snap_x0s = jnp.stack(sn_x)
        snap_valids = jnp.stack(sn_v)
    else:
        (final, _, _), (snaps, snap_x0s, snap_valids) = jax.lax.scan(
            functools.partial(step, model_consts), init, inputs)

    if not scfg.collect_fifo:
        return DenoiseResult(final, None, None, None)
    # list-prepend order: newest (cleanest) first
    fifo_latents = jnp.flip(snaps, axis=0).transpose(1, 0, 2, 3, 4)
    fifo_x0 = jnp.flip(snap_x0s, axis=0).transpose(1, 0, 2, 3, 4)
    fifo_valid = jnp.flip(snap_valids, axis=0)
    return DenoiseResult(final, fifo_latents, fifo_x0, fifo_valid)


def ddim_invert(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: S.DiffusionSchedule,
    latents: jnp.ndarray,  # [B, F, C, H, W] clean latents
    num_inference_steps: int = 52,
) -> jnp.ndarray:
    """Deterministic DDIM inversion: clean latents -> their generating noise.

    The reference keeps a DDIM-inversion helper in `longvgen/utils/util.py`
    (used for edit-style workflows). Here: run the inference timestep grid in
    ascending order with `ddim_invert_step`, unconditional model only (CFG-free
    inversion is the standard choice — guidance makes inversion non-invertible).
    """
    ts = np.asarray(S.inference_timesteps(sched.config, num_inference_steps))[::-1]
    src_ts = np.concatenate([[-1], ts[:-1]])  # -1 => alpha_cumprod = 1 (clean)
    b = latents.shape[0]

    def step(x, inp):
        src_t, dst_t = inp
        # model is evaluated at the *current* noise level of x (src_t); the first
        # step queries t=-1 ~ clean input, matching the usual implementation that
        # uses the previous grid point's prediction.
        tvec = jnp.full((b,), jnp.maximum(src_t, 0), dtype=jnp.int32)
        eps = model_fn(x, tvec).astype(jnp.float32)
        sb = jnp.full((b,), src_t, dtype=jnp.int32)
        db = jnp.full((b,), dst_t, dtype=jnp.int32)
        return S.ddim_invert_step(sched, eps, x, sb, db), None

    out, _ = jax.lax.scan(step, latents.astype(jnp.float32),
                          (jnp.asarray(src_ts), jnp.asarray(ts)))
    return out

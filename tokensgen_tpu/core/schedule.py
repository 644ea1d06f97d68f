"""CogVideoX diffusion schedules and solver steps as pure, vmappable JAX functions.

Replaces the reference's stateful scheduler classes
(`/root/reference/longvgen/schedulers/scheduling_dpm_cogvideox.py`,
`scheduling_ddim_cogvideox.py`) with:

* a :class:`DiffusionSchedule` of host-precomputed coefficient tables (float64
  numpy → float32 device arrays), and
* stateless ``*_step`` functions whose timestep arguments are *data* (any shape
  broadcastable against the sample's leading dims), so one call advances a whole
  FIFO queue of frames each sitting at its own noise level — no per-frame Python
  loop, unlike the reference (`cogvideo_sampling_mp_fifo.py:537-550`).

Numerical details preserved from the reference:
* scaled-linear betas computed in float64 (`scheduling_dpm_cogvideox.py:204`),
* SD3-style SNR shift `ac / (s + (1-s)·ac)` with s=3.0 (`:217`),
* zero-terminal-SNR rescale on sqrt(alphas_cumprod) (`:96-124`),
* the `vip_1` piecewise re-warp of alphas_cumprod used by T2To (`:225-247`),
* DPM-Solver++(2M) stochastic step keyed by explicit (t, prev_t, t_back)
  (`:334-468`), DDIM deterministic step (`scheduling_ddim_cogvideox.py:383-401`),
* `add_noise`, one-beta `add_noise_to_xt` (FIFO tail renoising), `get_velocity`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.0120
    beta_schedule: str = "scaled_linear"  # "linear" | "scaled_linear" | "vip_1"
    snr_shift_scale: float = 3.0
    rescale_betas_zero_snr: bool = True
    set_alpha_to_one: bool = True
    timestep_spacing: str = "trailing"  # "linspace" | "leading" | "trailing"
    steps_offset: int = 0
    prediction_type: str = "v_prediction"  # "epsilon" | "sample" | "v_prediction"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed coefficient tables. A pytree, so it can cross `jit` boundaries."""

    betas: jnp.ndarray  # [T] original betas (pre-SNR-shift; used by add_noise_to_xt)
    alphas_cumprod: jnp.ndarray  # [T] post SNR-shift / zero-SNR / vip_1 warp
    final_alpha_cumprod: jnp.ndarray  # scalar
    config: ScheduleConfig = dataclasses.field(metadata={"static": True})

    def tree_flatten(self):
        return (self.betas, self.alphas_cumprod, self.final_alpha_cumprod), self.config

    @classmethod
    def tree_unflatten(cls, config, children):
        return cls(*children, config=config)


def _rescale_zero_terminal_snr(ac: np.ndarray) -> np.ndarray:
    s = np.sqrt(ac)
    s0, sT = s[0], s[-1]
    s = (s - sT) * (s0 / (s0 - sT))
    return s**2


def _vip_1_warp(ac: np.ndarray, T: int) -> np.ndarray:
    """Piecewise re-map of alphas_cumprod: the [0,0.5T) range is compressed into
    [0,0.3T) etc., shifting model capacity toward high-noise steps
    (`scheduling_dpm_cogvideox.py:225-247`)."""
    a1, na1 = int(T * 0.5), int(T * 0.3)
    a2, na2 = int(T * 0.8), int(T * 0.5)

    def shift(a: int, b: int, na: int, nb: int) -> np.ndarray:
        seg = ac[na:nb]
        return (seg - ac[na]) / (ac[nb - 1] - ac[na]) * (ac[b - 1] - ac[a]) + ac[a]

    return np.concatenate([shift(0, a1, 0, na1), shift(a1, a2, na1, na2), shift(a2, T, na2, T)])


def make_schedule(config: ScheduleConfig = ScheduleConfig()) -> DiffusionSchedule:
    T = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, T, dtype=np.float64)
    elif config.beta_schedule in ("scaled_linear", "vip_1"):
        betas = (
            np.linspace(config.beta_start**0.5, config.beta_end**0.5, T, dtype=np.float64) ** 2
        )
    else:
        raise NotImplementedError(config.beta_schedule)

    ac = np.cumprod(1.0 - betas)
    s = config.snr_shift_scale
    ac = ac / (s + (1.0 - s) * ac)
    if config.rescale_betas_zero_snr:
        ac = _rescale_zero_terminal_snr(ac)
    if config.beta_schedule == "vip_1":
        ac = _vip_1_warp(ac, T)

    final = 1.0 if config.set_alpha_to_one else float(ac[0])
    return DiffusionSchedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(ac, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, dtype=jnp.float32),
        config=config,
    )


def inference_timesteps(config: ScheduleConfig, num_inference_steps: int) -> np.ndarray:
    """Descending int timestep vector (host-side; mirrors `set_timesteps`)."""
    T = config.num_train_timesteps
    if num_inference_steps > T:
        raise ValueError(f"num_inference_steps {num_inference_steps} > {T}")
    if config.timestep_spacing == "linspace":
        ts = np.linspace(0, T - 1, num_inference_steps).round()[::-1].astype(np.int64)
    elif config.timestep_spacing == "leading":
        step_ratio = T // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts = ts + config.steps_offset
    elif config.timestep_spacing == "trailing":
        step_ratio = T / num_inference_steps
        ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(config.timestep_spacing)
    return ts.copy()


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _bcast(coef: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """Right-pad coefficient dims so [B] / [B,F] broadcasts against [B,F,C,H,W]."""
    return coef.reshape(coef.shape + (1,) * (sample.ndim - coef.ndim))


def _alpha_at(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """alphas_cumprod[t], with t < 0 mapping to final_alpha_cumprod."""
    safe = jnp.clip(t, 0, sched.config.num_train_timesteps - 1)
    return jnp.where(t >= 0, sched.alphas_cumprod[safe], sched.final_alpha_cumprod)


def pred_original_sample(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    t: jnp.ndarray,
    prediction_type: Optional[str] = None,
) -> jnp.ndarray:
    """x0 estimate from a model output at (vector) timestep t."""
    prediction_type = prediction_type or sched.config.prediction_type
    ap = _bcast(_alpha_at(sched, t), sample)
    bp = 1.0 - ap
    if prediction_type == "epsilon":
        return (sample - bp**0.5 * model_output) / ap**0.5
    if prediction_type == "sample":
        return model_output
    if prediction_type == "v_prediction":
        return ap**0.5 * sample - bp**0.5 * model_output
    raise ValueError(prediction_type)


# ---------------------------------------------------------------------------
# solver steps
# ---------------------------------------------------------------------------


def pred_epsilon(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    t: jnp.ndarray,
    prediction_type: Optional[str] = None,
) -> jnp.ndarray:
    """Noise (eps) estimate from a model output at (vector) timestep t."""
    prediction_type = prediction_type or sched.config.prediction_type
    ap = _bcast(_alpha_at(sched, t), sample)
    bp = 1.0 - ap
    if prediction_type == "epsilon":
        return model_output
    if prediction_type == "sample":
        return (sample - ap**0.5 * model_output) / jnp.maximum(bp, 1e-12) ** 0.5
    if prediction_type == "v_prediction":
        return ap**0.5 * model_output + bp**0.5 * sample
    raise ValueError(prediction_type)


def ddim_step(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic DDIM step -> (prev_sample, pred_x0).

    `prev = a_t·x + b_t·x0` with `a_t = sqrt((1-ap_prev)/(1-ap))`,
    `b_t = sqrt(ap_prev) - sqrt(ap)·a_t` (`scheduling_ddim_cogvideox.py:383-401`).
    """
    x0 = pred_original_sample(sched, model_output, sample, t)
    ap = _bcast(_alpha_at(sched, t), sample)
    ap_prev = _bcast(_alpha_at(sched, prev_t), sample)
    a_t = ((1.0 - ap_prev) / (1.0 - ap)) ** 0.5
    b_t = ap_prev**0.5 - ap**0.5 * a_t
    return a_t * sample + b_t * x0, x0


def ddim_invert_step(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    t: jnp.ndarray,
    next_t: jnp.ndarray,
) -> jnp.ndarray:
    """Deterministic DDIM inversion step: x_t -> x_{next_t} with next_t noisier.

    Counterpart of `ddim_step` run in reverse (the reference ships this as the
    DDIM-inversion helper in `longvgen/utils/util.py`): decompose the sample at
    t into (x0, eps) under the model's prediction type, then re-compose at the
    higher-noise level `x_next = sqrt(ap_next)·x0 + sqrt(1-ap_next)·eps`.
    """
    x0 = pred_original_sample(sched, model_output, sample, t)
    eps = pred_epsilon(sched, model_output, sample, t)
    ap_next = _bcast(_alpha_at(sched, next_t), sample)
    return ap_next**0.5 * x0 + (1.0 - ap_next) ** 0.5 * eps


def dpm_step(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    t_back: Optional[jnp.ndarray] = None,
    old_pred_original_sample: Optional[jnp.ndarray] = None,
    old_valid: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
    noise2: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stochastic DPM-Solver++(2M) step -> (prev_sample, pred_x0).

    Vectorised port of `CogVideoXDPMScheduler.step` (`scheduling_dpm_cogvideox.py:
    334-468`): timesteps are arrays, and the reference's Python-level branches become
    masks —

    * ``t_back is None``            -> pure first-order update;
    * ``old_pred_original_sample``  (+ optional bool ``old_valid`` per element)
      selects the multistep update `denoised_d = m3·x0 - m4·old_x0` wherever the
      history is valid *and* ``prev_t >= 0``, exactly matching the reference's
      `old_pred_original_sample is None or prev_timestep < 0` early-out.
    * ``noise``/``noise2`` are injectable (parity without torch RNG); omitted noise
      means a deterministic (probability-flow-like) update with the same means.
    """
    x0 = pred_original_sample(sched, model_output, sample, t)
    ap = _bcast(_alpha_at(sched, t), sample)
    ap_prev = _bcast(_alpha_at(sched, prev_t), sample)

    lamb = jnp.log((ap / (1.0 - ap)) ** 0.5)
    lamb_next = jnp.log((ap_prev / (1.0 - ap_prev)) ** 0.5)
    h = lamb_next - lamb

    mult1 = ((1.0 - ap_prev) / (1.0 - ap)) ** 0.5 * jnp.exp(-h)
    mult2 = jnp.expm1(-2.0 * h) * ap_prev**0.5
    mult_noise = (1.0 - ap_prev) ** 0.5 * (1.0 - jnp.exp(-2.0 * h)) ** 0.5

    def first_order(n):
        nz = mult_noise * n if n is not None else 0.0
        return mult1 * sample - mult2 * x0 + nz

    if t_back is None or old_pred_original_sample is None:
        return first_order(noise), x0

    ap_back = _bcast(_alpha_at(sched, t_back), sample)
    lamb_prev = jnp.log((ap_back / (1.0 - ap_back)) ** 0.5)
    r = (lamb - lamb_prev) / h
    mult3 = 1.0 + 1.0 / (2.0 * r)
    mult4 = 1.0 / (2.0 * r)

    denoised_d = mult3 * x0 - mult4 * old_pred_original_sample
    n2 = noise2 if noise2 is not None else noise
    nz2 = mult_noise * n2 if n2 is not None else 0.0
    multistep = mult1 * sample - mult2 * denoised_d + nz2

    use_multi = _bcast(prev_t >= 0, sample)
    if old_valid is not None:
        use_multi = jnp.logical_and(use_multi, _bcast(old_valid, sample))
    return jnp.where(use_multi, multistep, first_order(noise)), x0


# ---------------------------------------------------------------------------
# forward process utilities
# ---------------------------------------------------------------------------


def add_noise(
    sched: DiffusionSchedule,
    original_samples: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    ap = _bcast(_alpha_at(sched, t), original_samples).astype(original_samples.dtype)
    return ap**0.5 * original_samples + (1.0 - ap) ** 0.5 * noise


def add_noise_to_xt(
    sched: DiffusionSchedule,
    xt_previous: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Single-beta renoise `x_t = sqrt(1-β_t)·x_{t-1} + sqrt(β_t)·ε`, used when a
    recycled frame is pushed back into the FIFO queue tail
    (`scheduling_dpm_cogvideox.py:497-518`). Uses the *original* betas."""
    beta = _bcast(sched.betas[t], xt_previous)
    return (1.0 - beta) ** 0.5 * xt_previous + beta**0.5 * noise


def get_velocity(
    sched: DiffusionSchedule,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    ap = _bcast(_alpha_at(sched, t), sample).astype(sample.dtype)
    return ap**0.5 * noise - (1.0 - ap) ** 0.5 * sample

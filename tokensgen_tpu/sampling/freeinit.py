"""FreeInit iterative noise re-initialisation (sampling-mode "fifo_freeinit").

The reference exposes `sampling_mode: denoising_together | fifo_freeinit`
(`/root/reference/longvgen/pipeline/pipeline_cogvideox.py:1264-1268`) but the
functions it dispatches to are never defined (dead config paths; the UNet-era
`fifo_freeinit` lives in `longvgen/fifo_sampling/sampling.py:246-491`). This is a
working implementation of the standard FreeInit procedure (Wu et al., ICLR'24),
matching the UNet-era code's structure: after each full denoise pass, keep the
low spatio-temporal frequencies of the diffused result and resample the high
frequencies from fresh noise, then denoise again.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def butterworth_low_pass_3d(shape, d_s: float = 0.25, d_t: float = 0.25,
                            order: int = 4) -> jnp.ndarray:
    """[F, H, W] low-pass mask in centred frequency space."""
    f, h, w = shape
    tt = (jnp.arange(f) / f - 0.5)[:, None, None]
    hh = (jnp.arange(h) / h - 0.5)[None, :, None]
    ww = (jnp.arange(w) / w - 0.5)[None, None, :]
    d_sq = (tt / max(d_t, 1e-6)) ** 2 + (hh / max(d_s, 1e-6)) ** 2 + (
        ww / max(d_s, 1e-6)
    ) ** 2
    return 1.0 / (1.0 + d_sq**order)


def freq_mix_3d(x: jnp.ndarray, noise: jnp.ndarray, lpf: jnp.ndarray) -> jnp.ndarray:
    """Low frequencies from x, high frequencies from noise.
    x/noise: [B, F, C, H, W]; lpf: [F, H, W]."""
    axes = (1, 3, 4)
    xf = jnp.fft.fftshift(jnp.fft.fftn(x.astype(jnp.complex64), axes=axes), axes=axes)
    nf = jnp.fft.fftshift(jnp.fft.fftn(noise.astype(jnp.complex64), axes=axes), axes=axes)
    m = lpf[None, :, None, :, :]
    mixed = xf * m + nf * (1 - m)
    out = jnp.fft.ifftn(jnp.fft.ifftshift(mixed, axes=axes), axes=axes)
    return jnp.real(out).astype(x.dtype)


def freeinit_refine(
    denoise_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
    add_noise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    initial_noise: jnp.ndarray,  # [B, F, C, H, W]
    rng: jax.Array,
    num_iters: int = 3,
    d_s: float = 0.25,
    d_t: float = 0.25,
) -> jnp.ndarray:
    """Run ``num_iters`` denoise passes with frequency re-initialisation between
    them. ``denoise_fn(latents, rng) -> clean_latents``;
    ``add_noise_fn(clean, noise) -> x_T`` re-diffuses to the initial timestep."""
    lpf = butterworth_low_pass_3d(
        (initial_noise.shape[1],) + initial_noise.shape[3:], d_s, d_t
    )
    latents = initial_noise
    clean = None
    for it in range(num_iters):
        rng, r_d, r_n = jax.random.split(rng, 3)
        clean = denoise_fn(latents, r_d)
        if it == num_iters - 1:
            break
        fresh = jax.random.normal(r_n, clean.shape, clean.dtype)
        diffused = add_noise_fn(clean, fresh)
        fresh2 = jax.random.normal(jax.random.fold_in(r_n, 1), clean.shape, clean.dtype)
        latents = freq_mix_3d(diffused, fresh2, lpf)
    return clean

"""Value-range diagnostics — the reference's de-facto numeric regression check
(debug prints of min/max/mean/std at each stage, SURVEY §4), as an opt-in
utility that works inside jit via `jax.debug.print`.

Enable with ``TOKENSGEN_DEBUG=1``. No-op (and traced away) otherwise.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_ENABLED = os.environ.get("TOKENSGEN_DEBUG") == "1"


def enabled() -> bool:
    return _ENABLED


def stats(name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Print value-range stats for a (possibly traced) array; returns x."""
    if not _ENABLED:
        return x
    xf = x.astype(jnp.float32)
    jax.debug.print(
        name + ": min {mn:.4f} max {mx:.4f} mean {me:.4f} std {sd:.4f}",
        mn=jnp.min(xf), mx=jnp.max(xf), me=jnp.mean(xf), sd=jnp.std(xf),
    )
    return x

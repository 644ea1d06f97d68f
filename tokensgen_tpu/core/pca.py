"""JAX PCA matching sklearn/reference semantics (`/root/reference/pca.py:6-66`).

T2To operates in a PCA-compressed token space: the 3072-dim condensed tokens are
projected to their first 16 principal components for diffusion and lifted back for
rendering. The fitted state is a plain pytree so it can be saved with orbax and
imported from the reference's ``pca.pt`` artifact (see ``convert/artifacts.py``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class PCAState(NamedTuple):
    mean: jnp.ndarray  # [1, D]
    components: jnp.ndarray  # [K, D] rows are principal axes


def _svd_flip(u: jnp.ndarray, vt: jnp.ndarray):
    """Deterministic sign convention: flip each singular pair so that the
    largest-|u| entry of each left vector is positive (sklearn's u-based rule,
    `pca.py:11-38`)."""
    max_abs_cols = jnp.argmax(jnp.abs(u), axis=0)
    signs = jnp.sign(u[max_abs_cols, jnp.arange(u.shape[1])])
    return u * signs, vt * signs[:, None]


def fit(x: jnp.ndarray, n_components: Optional[int] = None) -> PCAState:
    """Fit PCA on [N, D] data via SVD of the centered matrix."""
    n, d = x.shape
    k = d if n_components is None else min(n_components, d)
    mean = jnp.mean(x, axis=0, keepdims=True)
    z = x - mean
    u, s, vt = jnp.linalg.svd(z, full_matrices=False)
    u, vt = _svd_flip(u, vt)
    return PCAState(mean=mean, components=vt[:k])


def transform(state: PCAState, x: jnp.ndarray) -> jnp.ndarray:
    return (x - state.mean) @ state.components.T


def inverse_transform(state: PCAState, y: jnp.ndarray) -> jnp.ndarray:
    return y @ state.components + state.mean


def bottleneck(state: PCAState, x: jnp.ndarray, keep: int = 16) -> jnp.ndarray:
    """Project, zero all but the first ``keep`` components, lift back — the
    resampler's inference-time PCA bottleneck (`resampler.py:230-237`)."""
    y = transform(state, x)
    y = y.at[..., keep:].set(0.0)
    return inverse_transform(state, y)

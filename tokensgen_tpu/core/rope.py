"""3D rotary and sin/cos positional embeddings for CogVideoX-style video DiTs.

Semantics match the reference implementation
(`/root/reference/longvgen/models/embeddings.py:100-168,571-707,774-890`):

* 1-D rotary tables use `freqs = 1 / theta**(2i/dim)`, and the returned cos/sin are
  *pair-interleaved* to full `dim` (`repeat_interleave(2)` in torch terms).
* 3-D rotary factorises the head dim into (t, h, w) sub-dims — default
  `(dim//4, 3*dim//8, 3*dim//8)` — and broadcasts each axis table over the video grid.
* `apply_rotary_emb` uses the interleaved rotate-half convention
  `(x0, x1) -> (-x1, x0)` and computes in float32 before casting back.

Grid/table construction is host-side numpy (it is static per shape and precomputed
outside `jit`); only `apply_rotary_emb` runs on device.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Rope = Tuple[jnp.ndarray, jnp.ndarray]  # (cos, sin), each [S, D]


def get_1d_rotary_pos_embed(
    dim: int,
    pos: np.ndarray,
    theta: float = 10000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables of shape [len(pos), dim], pair-interleaved."""
    assert dim % 2 == 0, dim
    pos = np.asarray(pos, dtype=np.float32)
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim))  # [D/2]
    angles = np.outer(pos, freqs)  # [S, D/2]
    cos = np.repeat(np.cos(angles), 2, axis=1).astype(np.float32)
    sin = np.repeat(np.sin(angles), 2, axis=1).astype(np.float32)
    return cos, sin


def _combine_thw(
    ft: Tuple[np.ndarray, np.ndarray],
    fh: Tuple[np.ndarray, np.ndarray],
    fw: Tuple[np.ndarray, np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """Broadcast per-axis tables over the (T, H, W) grid and flatten to [T*H*W, D]."""
    out = []
    for i in range(2):  # cos, sin
        t, h, w = ft[i], fh[i], fw[i]
        T, H, W = t.shape[0], h.shape[0], w.shape[0]
        t = np.broadcast_to(t[:, None, None, :], (T, H, W, t.shape[-1]))
        h = np.broadcast_to(h[None, :, None, :], (T, H, W, h.shape[-1]))
        w = np.broadcast_to(w[None, None, :, :], (T, H, W, w.shape[-1]))
        out.append(np.concatenate([t, h, w], axis=-1).reshape(T * H * W, -1))
    return out[0], out[1]


def get_3d_rotary_pos_embed(
    embed_dim: int,
    crops_coords: Tuple[Sequence[float], Sequence[float]],
    grid_size: Tuple[int, int, int],
    theta: float = 10000.0,
) -> Rope:
    """3-D rotary tables over a cropped (f, h, w) region.

    ``crops_coords`` is ``[[f0, h0, w0], [f1, h1, w1]]``; per-axis positions are
    ``linspace(start, stop, n, endpoint=False)`` as in the reference
    (`embeddings.py:596-600`).
    """
    start, stop = crops_coords
    nt, nh, nw = grid_size
    grid_t = np.linspace(start[0], stop[0], nt, endpoint=False, dtype=np.float32)
    grid_h = np.linspace(start[1], stop[1], nh, endpoint=False, dtype=np.float32)
    grid_w = np.linspace(start[2], stop[2], nw, endpoint=False, dtype=np.float32)
    return get_3d_rotary_pos_embed_v2(embed_dim, grid_t, grid_h, grid_w, theta=theta)


def get_3d_rotary_pos_embed_v2(
    embed_dim: int,
    grid_t: np.ndarray,
    grid_h: np.ndarray,
    grid_w: np.ndarray,
    dim_t: int | None = None,
    dim_h: int | None = None,
    dim_w: int | None = None,
    theta: float = 10000.0,
) -> Rope:
    """3-D rotary tables from raw per-axis position grids with optional per-axis dims.

    Mirrors `get_3d_rotary_pos_embed_v2` (`embeddings.py:641-707`) — used by the FIFO
    sampler (rolling temporal grids) and T2To (dims (52, 6, 6) over an 8x12 grid).
    """
    dim_t = embed_dim // 4 if dim_t is None else dim_t
    dim_h = embed_dim // 8 * 3 if dim_h is None else dim_h
    dim_w = embed_dim // 8 * 3 if dim_w is None else dim_w
    ft = get_1d_rotary_pos_embed(dim_t, grid_t, theta)
    fh = get_1d_rotary_pos_embed(dim_h, grid_h, theta)
    fw = get_1d_rotary_pos_embed(dim_w, grid_w, theta)
    cos, sin = _combine_thw(ft, fh, fw)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rotary_emb(x: jnp.ndarray, freqs: Rope) -> jnp.ndarray:
    """Apply interleaved rotary embedding.

    ``x``: [..., S, D] (typically [B, H, S, D]); ``freqs``: (cos, sin) each [S, D]
    or [B, S, D]. Matches `apply_rotary_emb` (`embeddings.py:840-885`): float32
    compute, ``(x0, x1) -> (-x1, x0)`` rotation.
    """
    cos, sin = freqs
    if cos.ndim == 2:
        cos, sin = cos[None, None], sin[None, None]
    elif cos.ndim == 3:  # batched tables: [B, S, D] -> [B, 1, S, D]
        cos, sin = cos[:, None], sin[:, None]
    xf = x.astype(jnp.float32)
    pair = xf.reshape(*xf.shape[:-1], -1, 2)
    rotated = jnp.stack([-pair[..., 1], pair[..., 0]], axis=-1).reshape(xf.shape)
    return (xf * cos + rotated * sin).astype(x.dtype)


def _rotary_1d_jnp(dim: int, pos: jnp.ndarray, theta: float = 10000.0):
    freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    angles = pos.astype(jnp.float32)[:, None] * freqs[None, :]
    cos = jnp.repeat(jnp.cos(angles), 2, axis=1)
    sin = jnp.repeat(jnp.sin(angles), 2, axis=1)
    return cos, sin


def get_3d_rotary_pos_embed_v2_jnp(
    embed_dim: int,
    grid_t: jnp.ndarray,
    grid_h: jnp.ndarray,
    grid_w: jnp.ndarray,
    dim_t: int | None = None,
    dim_h: int | None = None,
    dim_w: int | None = None,
    theta: float = 10000.0,
) -> Rope:
    """Traced-grid variant of :func:`get_3d_rotary_pos_embed_v2` for use inside
    `jit`/`scan` — the FIFO engine's rolling temporal grids are data
    (`cogvideo_sampling_mp_fifo.py:262-271` recomputes tables per window)."""
    dim_t = embed_dim // 4 if dim_t is None else dim_t
    dim_h = embed_dim // 8 * 3 if dim_h is None else dim_h
    dim_w = embed_dim // 8 * 3 if dim_w is None else dim_w
    ft = _rotary_1d_jnp(dim_t, jnp.asarray(grid_t), theta)
    fh = _rotary_1d_jnp(dim_h, jnp.asarray(grid_h), theta)
    fw = _rotary_1d_jnp(dim_w, jnp.asarray(grid_w), theta)
    T, H, W = ft[0].shape[0], fh[0].shape[0], fw[0].shape[0]
    out = []
    for i in range(2):
        t = jnp.broadcast_to(ft[i][:, None, None, :], (T, H, W, ft[i].shape[-1]))
        h = jnp.broadcast_to(fh[i][None, :, None, :], (T, H, W, fh[i].shape[-1]))
        w = jnp.broadcast_to(fw[i][None, None, :, :], (T, H, W, fw[i].shape[-1]))
        out.append(jnp.concatenate([t, h, w], axis=-1).reshape(T * H * W, -1))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# sin/cos absolute positional embeddings (CogVideoX-2b style + VIP grids)
# ---------------------------------------------------------------------------


def _sincos_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[*, D] sincos table: concat(sin, cos) halves per diffusers convention."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000.0**omega
    out = np.einsum("s,d->sd", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def _2d_sincos_from_grid(embed_dim: int, grid: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    emb_h = _sincos_from_grid(embed_dim // 2, grid[0])  # over w-major grid rows
    emb_w = _sincos_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int,
    spatial_size: Tuple[int, int],  # (W, H)
    temporal_size: int,
    spatial_interpolation_scale: float = 1.0,
    temporal_interpolation_scale: float = 1.0,
) -> np.ndarray:
    """[T, H*W, D] 3-D sincos table; D split 1/4 temporal + 3/4 spatial
    (`embeddings.py:88-127`)."""
    grid_h = np.arange(spatial_size[1], dtype=np.float32) / spatial_interpolation_scale
    grid_w = np.arange(spatial_size[0], dtype=np.float32) / spatial_interpolation_scale
    grid_t = np.arange(temporal_size, dtype=np.float32) / temporal_interpolation_scale
    return get_3d_sincos_pos_embed_v2(embed_dim, grid_h, grid_w, grid_t)


def get_3d_sincos_pos_embed_v2(
    embed_dim: int,
    grid_h: np.ndarray,
    grid_w: np.ndarray,
    grid_t: np.ndarray,
) -> np.ndarray:
    """[T, H*W, D] sincos table from raw grids (`embeddings.py:128-168`) — used for
    the per-sample VIP positional embeddings keyed on rolling `grid_t`."""
    if embed_dim % 4 != 0:
        raise ValueError("`embed_dim` must be divisible by 4")
    dim_spatial = 3 * embed_dim // 4
    dim_temporal = embed_dim // 4
    w_mesh, h_mesh = np.meshgrid(grid_w, grid_h)  # w varies fastest, rows are h
    grid = np.stack([w_mesh, h_mesh], axis=0).reshape(
        2, 1, grid_h.shape[0], grid_w.shape[0]
    )
    pe_spatial = _2d_sincos_from_grid(dim_spatial, grid)  # [H*W, 3D/4]
    pe_temporal = _sincos_from_grid(dim_temporal, grid_t)  # [T, D/4]
    T, HW = grid_t.shape[0], grid_h.shape[0] * grid_w.shape[0]
    pe_spatial = np.broadcast_to(pe_spatial[None], (T, HW, dim_spatial))
    pe_temporal = np.broadcast_to(pe_temporal[:, None, :], (T, HW, dim_temporal))
    return np.concatenate([pe_temporal, pe_spatial], axis=-1).astype(np.float32)

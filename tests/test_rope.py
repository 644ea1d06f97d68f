"""RoPE / sincos table tests against independent numpy oracles."""

import numpy as np
import jax.numpy as jnp

from tokensgen_tpu.core import rope as R


def test_1d_rotary_interleaved():
    dim, S = 8, 5
    cos, sin = R.get_1d_rotary_pos_embed(dim, np.arange(S))
    assert cos.shape == (S, dim)
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2) / dim))
    for s in range(S):
        for i in range(dim // 2):
            a = s * freqs[i]
            np.testing.assert_allclose(cos[s, 2 * i], np.cos(a), rtol=1e-6)
            np.testing.assert_allclose(cos[s, 2 * i + 1], np.cos(a), rtol=1e-6)
            np.testing.assert_allclose(sin[s, 2 * i], np.sin(a), rtol=1e-6)


def test_3d_rotary_shapes_and_split():
    head_dim = 64
    cos, sin = R.get_3d_rotary_pos_embed(
        head_dim, ([0, 0, 0], [13, 30, 45]), (13, 30, 45)
    )
    assert cos.shape == (13 * 30 * 45, head_dim)
    # dims: t=16, h=24, w=24 (SURVEY §2.5)
    ft_cos, _ = R.get_1d_rotary_pos_embed(16, np.linspace(0, 13, 13, endpoint=False))
    np.testing.assert_allclose(np.asarray(cos)[:, :16].reshape(13, 30 * 45, 16)[:, 0],
                               ft_cos, rtol=1e-5)


def test_3d_rotary_v2_custom_dims():
    # T2To RoPE: dims (52, 6, 6) over an 8x12 grid, 96 temporal positions
    cos, sin = R.get_3d_rotary_pos_embed_v2(
        64, np.arange(96, dtype=np.float32), np.arange(8, dtype=np.float32),
        np.arange(12, dtype=np.float32), dim_t=52, dim_h=6, dim_w=6,
    )
    assert cos.shape == (96 * 8 * 12, 64)


def test_apply_rotary_rotation_property():
    """RoPE must preserve norms and implement a relative rotation."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 4, 8)).astype(np.float32)
    cos, sin = R.get_1d_rotary_pos_embed(8, np.arange(4))
    out = R.apply_rotary_emb(jnp.asarray(x), (jnp.asarray(cos), jnp.asarray(sin)))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4
    )
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(out)[:, :, 0], x[:, :, 0], rtol=1e-5)
    # manual 2-dim check at position 1, first pair
    a = 1.0  # freq_0 = 1
    expect0 = x[0, 0, 1, 0] * np.cos(a) - x[0, 0, 1, 1] * np.sin(a)
    expect1 = x[0, 0, 1, 1] * np.cos(a) + x[0, 0, 1, 0] * np.sin(a)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 1, 0], expect0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 1, 1], expect1, rtol=1e-4)


def test_apply_rotary_batched_tables():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 4, 8)).astype(np.float32)
    cos, sin = R.get_1d_rotary_pos_embed(8, np.arange(4))
    bc = jnp.broadcast_to(jnp.asarray(cos), (2, 4, 8))
    bs = jnp.broadcast_to(jnp.asarray(sin), (2, 4, 8))
    out_b = R.apply_rotary_emb(jnp.asarray(x), (bc, bs))
    out = R.apply_rotary_emb(jnp.asarray(x), (jnp.asarray(cos), jnp.asarray(sin)))
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out), rtol=1e-6)


def test_3d_sincos_shapes():
    pe = R.get_3d_sincos_pos_embed(64, (12, 8), 4, 1.875, 1.0)
    assert pe.shape == (4, 96, 64)
    # temporal part occupies the first quarter and varies along T only
    assert np.allclose(pe[0, 0, 16:], pe[1, 0, 16:])
    assert not np.allclose(pe[0, 0, :16], pe[1, 0, :16])

import numpy as np
import jax
import jax.numpy as jnp

from tokensgen_tpu.core import pca as P
from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig


def test_forward_shape_and_finite():
    cfg = ResamplerConfig.tiny()
    rng = np.random.default_rng(0)
    b, f, n = 2, 3, 4 * 6  # frames x spatial tokens
    x = jnp.asarray(rng.normal(size=(b, f, n, cfg.embedding_dim)), jnp.float32)
    model = Resampler(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (b, cfg.num_temporal_queries, cfg.output_dim,
                         cfg.num_height_queries, cfg.num_width_queries)
    assert np.isfinite(np.asarray(out)).all()


def test_rope_on_input_and_latents():
    cfg = ResamplerConfig.tiny()
    rng = np.random.default_rng(1)
    b, f, hp, wp = 1, 3, 2, 2
    n = hp * wp
    x = jnp.asarray(rng.normal(size=(b, f, n, cfg.embedding_dim)), jnp.float32)
    img_rope = get_3d_rotary_pos_embed_v2(cfg.dim_head, np.arange(f), np.arange(hp), np.arange(wp))
    smp_rope = get_3d_rotary_pos_embed_v2(
        cfg.dim_head, np.arange(cfg.num_temporal_queries),
        np.arange(cfg.num_height_queries), np.arange(cfg.num_width_queries),
    )
    model = Resampler(cfg)
    params = model.init(jax.random.PRNGKey(0), x, img_rope, smp_rope)
    out = model.apply(params, x, img_rope, smp_rope)
    out_no_rope = model.apply(params, x)
    assert not np.allclose(np.asarray(out), np.asarray(out_no_rope))


def test_pca_bottleneck_integration():
    cfg = ResamplerConfig.tiny()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 2, 6, cfg.embedding_dim)), jnp.float32)
    model = Resampler(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    # fit PCA on some token data in output space
    data = jnp.asarray(rng.normal(size=(200, cfg.output_dim)), jnp.float32)
    state = P.fit(data, None)
    out = model.apply(params, x, pca=state, pca_keep=4)
    # bottlenecked output must live in the 4-component affine subspace
    flat = np.asarray(out).transpose(0, 1, 3, 4, 2).reshape(-1, cfg.output_dim)
    y = np.asarray(P.transform(state, jnp.asarray(flat)))
    np.testing.assert_allclose(y[:, 4:], 0.0, atol=1e-3)

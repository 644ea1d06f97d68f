"""Sequence-parallel (Ulysses) attention == unsharded attention."""

import numpy as np
import jax.numpy as jnp

from tokensgen_tpu.kernels.attention import _xla_attention
from tokensgen_tpu.sharding import MeshSpec, make_mesh
from tokensgen_tpu.sharding.sp import ulysses_attention


def test_ulysses_matches_unsharded():
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 64, 16
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    ref = _xla_attention(q, k, v, jnp.zeros((b, s), jnp.float32), d**-0.5)

    for n in (2, 4):
        mesh = make_mesh(MeshSpec(data=1, queue=1, model=n))
        out = ulysses_attention(q, k, v, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def _tiny_dit_forward(sp_devices: int, heads: int, func_type):
    """Full-DiT forward, sp_axis-sharded vs unsharded, same params/inputs."""
    import dataclasses

    import jax
    import numpy as np

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    from tokensgen_tpu.models.dit import (
        CogVideoXTransformer, DiTConfig, VIPConfig, graft_vip_params)

    vc = None
    if func_type is not None:
        vc = VIPConfig(output_dim=24, num_temporal_queries=2,
                       num_height_queries=2, num_width_queries=3,
                       length=3 * 2 * 3, func_type=func_type)
    dcfg = DiTConfig.tiny(vip=vc, num_attention_heads=heads)
    m = CogVideoXTransformer(dcfg)
    m_sp = CogVideoXTransformer(dataclasses.replace(dcfg, sp_axis="model"))

    rng = np.random.default_rng(3)
    b, f = 1, 2
    hp, wp = dcfg.sample_height // 2, dcfg.sample_width // 2
    d = dcfg.attention_head_dim
    x = jnp.asarray(rng.normal(size=(b, f, 16, dcfg.sample_height,
                                     dcfg.sample_width)), jnp.float32)
    tx = jnp.asarray(rng.normal(size=(b, dcfg.max_text_seq_length,
                                      dcfg.text_embed_dim)), jnp.float32)
    t = jnp.full((b,), 500, jnp.int32)
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(f), np.arange(hp),
                                      np.arange(wp))
    kw = dict(image_rotary_emb=rope)
    if vc is not None:
        n_vip = 3
        kw.update(
            vip_hidden_states=jnp.asarray(
                rng.normal(size=(b, n_vip, vc.output_dim, 2, 3)), jnp.float32),
            vip_image_rotary_emb=rope,
            vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(
                d, np.arange(n_vip), np.arange(2), np.arange(3)))
    params = m.init(jax.random.PRNGKey(0), x, tx, t, **kw)["params"]
    if vc is not None:
        params = graft_vip_params(params, dcfg)
    ref = m.apply({"params": params}, x, tx, t, **kw)

    mesh = make_mesh(MeshSpec(data=1, model=sp_devices))
    from jax.sharding import NamedSharding, PartitionSpec as P

    with jax.set_mesh(mesh):
        # pin the jit OUTPUT replicated: GSPMD's free choice for the 5-D
        # output can pick a 2x2 model-axis tiling that has no NamedSharding
        # equivalent (ValueError at sharding recovery)
        out = jax.jit(lambda p, x_: m_sp.apply({"params": p}, x_, tx, t, **kw),
                      out_shardings=NamedSharding(mesh, P()))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sp_dit_forward_matches_unsharded_vip():
    # joint seq 8 text + 64 video = 72, vip 18: every attention call's q/kv
    # lengths divide by 2 (the production joint 18,256 divides by 16)
    _tiny_dit_forward(sp_devices=2, heads=2, func_type="1")


def test_sp_dit_forward_matches_unsharded_sp4():
    _tiny_dit_forward(sp_devices=4, heads=4, func_type=None)

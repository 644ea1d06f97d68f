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

import numpy as np
import jax.numpy as jnp

from tokensgen_tpu.core import cfg as C


def test_two_way_combine():
    u = np.ones((2, 3)) * 2.0
    t = np.ones((2, 3)) * 5.0
    out = C.combine(jnp.concatenate([jnp.asarray(u), jnp.asarray(t)]), 6.0)
    np.testing.assert_allclose(np.asarray(out), 2.0 + 6.0 * 3.0)


def test_three_way_combine():
    ut = np.full((1, 2), 1.0)
    ui = np.full((1, 2), 2.0)
    ti = np.full((1, 2), 4.0)
    batch = jnp.concatenate([jnp.asarray(ut), jnp.asarray(ui), jnp.asarray(ti)])
    out = C.combine(batch, 6.0, guidance_scale_img=1.5, use_separate_guidance=True)
    expect = 4.0 + (6.0 - 1) * (4.0 - 1.0) + (1.5 - 1) * (4.0 - 2.0)
    np.testing.assert_allclose(np.asarray(out), expect)


def test_dynamic_scale_matches_reference_formula():
    import math
    for t in [999, 500, 0]:
        got = float(C.dynamic_scale(6.0, jnp.asarray(t), 52))
        want = 1 + 6.0 * ((1 - math.cos(math.pi * ((52 - t) / 52) ** 5.0)) / 2)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_per_frame_guidance_scale():
    u = np.zeros((1, 3, 2))
    t = np.ones((1, 3, 2))
    g = jnp.asarray([1.0, 2.0, 3.0])
    out = C.combine(jnp.concatenate([jnp.asarray(u), jnp.asarray(t)]), g)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], [1.0, 2.0, 3.0])


def test_batch_for_cfg():
    x = jnp.ones((2, 3))
    assert C.batch_for_cfg(x, False).shape == (2, 3)
    assert C.batch_for_cfg(x, True).shape == (4, 3)
    assert C.batch_for_cfg(x, True, use_separate_guidance=True).shape == (6, 3)

"""PCA parity vs numpy-SVD oracle and reconstruction properties."""

import numpy as np
import jax.numpy as jnp

from tokensgen_tpu.core import pca as P


def _oracle_fit(x, k):
    mean = x.mean(0, keepdims=True)
    z = x - mean
    u, s, vt = np.linalg.svd(z, full_matrices=False)
    max_abs_cols = np.argmax(np.abs(u), axis=0)
    signs = np.sign(u[max_abs_cols, range(u.shape[1])])
    vt = vt * signs[:, None]
    return mean, vt[:k]


def test_fit_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 12)).astype(np.float64) @ np.diag(
        np.linspace(3, 0.1, 12)
    )
    st = P.fit(jnp.asarray(x), 4)
    mean_o, comp_o = _oracle_fit(x, 4)
    np.testing.assert_allclose(np.asarray(st.mean), mean_o, rtol=1e-5, atol=1e-8)
    # components match up to numerical precision (signs are pinned by svd_flip)
    np.testing.assert_allclose(np.abs(np.asarray(st.components)), np.abs(comp_o), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.components), comp_o, rtol=1e-4, atol=1e-6)


def test_full_rank_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 8)).astype(np.float32)
    st = P.fit(jnp.asarray(x), None)
    y = P.transform(st, jnp.asarray(x))
    rec = P.inverse_transform(st, y)
    np.testing.assert_allclose(np.asarray(rec), x, rtol=1e-3, atol=1e-4)


def test_bottleneck_zeroes_tail_components():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(100, 32)).astype(np.float32)
    st = P.fit(jnp.asarray(x), None)
    out = P.bottleneck(st, jnp.asarray(x), keep=16)
    y = P.transform(st, out)
    np.testing.assert_allclose(np.asarray(y)[:, 16:], 0.0, atol=1e-4)
    # first 16 components preserved
    y_full = P.transform(st, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y)[:, :16], np.asarray(y_full)[:, :16], rtol=1e-3, atol=1e-4)


def test_matches_reference_torch_pca():
    """Cross-check against the reference's torch PCA implementation run as an oracle."""
    import importlib.util
    import torch

    spec = importlib.util.spec_from_file_location("ref_pca", "/root/reference/pca.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(120, 10)).astype(np.float64)
    ref_pca = ref.PCA(n_components=5).fit(torch.tensor(x))
    st = P.fit(jnp.asarray(x), 5)
    # the jnp path computes in float32 (x64 disabled); torch oracle is float64
    np.testing.assert_allclose(
        np.asarray(st.components), ref_pca.components_.numpy(), rtol=1e-3, atol=1e-5
    )
    t_ref = ref_pca.transform(torch.tensor(x)).numpy()
    t_jax = np.asarray(P.transform(st, jnp.asarray(x)))
    np.testing.assert_allclose(t_jax, t_ref, rtol=1e-3, atol=1e-4)

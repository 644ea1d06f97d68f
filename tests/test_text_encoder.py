"""make_text_encoder failure semantics: a configured-but-broken T5 dir must
raise instead of silently degrading to hash pseudo-embeddings."""

import numpy as np
import pytest

from tokensgen_tpu.models.text_encoder import (
    CachedTextEncoder,
    HashTextEncoder,
    make_text_encoder,
)


def test_missing_dir_raises_by_default(tmp_path):
    with pytest.raises(RuntimeError, match="failed to load T5"):
        make_text_encoder(str(tmp_path / "nonexistent-t5"))


def test_corrupt_dir_raises_by_default(tmp_path):
    bad = tmp_path / "t5"
    bad.mkdir()
    (bad / "model.safetensors").write_bytes(b"not a safetensors file")
    with pytest.raises(RuntimeError, match="failed to load T5"):
        make_text_encoder(str(bad))


def test_fallback_opt_in(tmp_path):
    enc = make_text_encoder(
        str(tmp_path / "nonexistent-t5"), max_length=8, embed_dim=16,
        allow_hash_fallback=True)
    out = enc(["a prompt"])
    assert out.shape == (1, 8, 16)


def test_no_dir_means_hash_encoder():
    enc = make_text_encoder(None, max_length=8, embed_dim=16)
    assert isinstance(enc, CachedTextEncoder)
    assert isinstance(enc.inner, HashTextEncoder)
    a = np.asarray(enc(["same prompt"]))
    b = np.asarray(enc(["same prompt"]))
    np.testing.assert_array_equal(a, b)

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


def test_t5_from_pretrained_tiny_dir(tmp_path):
    """Real loading path: HF torch weights + fast tokenizer in one dir,
    config inferred from the state-dict shapes."""
    from tests._tiny_t5 import write_tiny_t5_dir

    d = tmp_path / "t5"
    write_tiny_t5_dir(str(d), d_model=24)
    enc = make_text_encoder(str(d), max_length=8, embed_dim=24)
    out = np.asarray(enc(["a tiny smoke test", ""]))
    assert out.shape == (2, 8, 24)
    assert np.isfinite(out).all()
    # distinct prompts must produce distinct embeddings
    assert np.abs(out[0] - out[1]).max() > 1e-4
    # cached second call is identical
    np.testing.assert_array_equal(out[0], np.asarray(enc(["a tiny smoke test"]))[0])


def test_t5_sibling_tokenizer_dir(tmp_path):
    """CogVideoX-5b layout: weights in `text_encoder/`, tokenizer in the
    sibling `tokenizer/` dir."""
    from tests._tiny_t5 import write_tiny_t5_dir, write_tiny_tokenizer

    write_tiny_t5_dir(str(tmp_path / "text_encoder"), d_model=24,
                      with_tokenizer=False)
    write_tiny_tokenizer(str(tmp_path / "tokenizer"))
    enc = make_text_encoder(str(tmp_path / "text_encoder"), max_length=8,
                            embed_dim=24)
    assert np.asarray(enc(["a prompt"])).shape == (1, 8, 24)


def test_t5_from_converted(tmp_path):
    """convert_weights.py export path: t5.safetensors (our param layout) +
    explicit tokenizer dir; matches the from_pretrained output exactly."""
    from tests._tiny_t5 import write_tiny_t5_dir, write_tiny_tokenizer

    from tokensgen_tpu.convert.safetensors_io import (
        load_safetensors, save_param_tree)
    from tokensgen_tpu.convert.torch_weights import convert_t5

    src = tmp_path / "t5_src"
    write_tiny_t5_dir(str(src), d_model=24)
    sd = load_safetensors(str(src / "model.safetensors"))
    tree = convert_t5(sd, 2)
    conv = tmp_path / "converted"
    conv.mkdir()
    save_param_tree(str(conv / "t5.safetensors"), tree)
    tok_dir = tmp_path / "tok"
    write_tiny_tokenizer(str(tok_dir))

    enc = make_text_encoder(None, max_length=8, embed_dim=24,
                            converted_path=str(conv / "t5.safetensors"),
                            tokenizer_dir=str(tok_dir))
    ref = make_text_encoder(str(src), max_length=8, embed_dim=24)
    np.testing.assert_allclose(
        np.asarray(enc(["a tiny test"])), np.asarray(ref(["a tiny test"])),
        atol=1e-6)


def test_converted_missing_raises():
    with pytest.raises(RuntimeError, match="failed to load T5"):
        make_text_encoder(None, converted_path="/nonexistent/t5.safetensors",
                          tokenizer_dir="/nonexistent")

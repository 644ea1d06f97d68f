"""Native (C++) latent-store reader tests; falls back to python when unbuilt."""

import numpy as np

from tokensgen_tpu.data.native_store import (
    build_native, load_npy_batch, native_available, read_files_batch,
)


def test_build_and_roundtrip(tmp_path):
    build_native()
    rng = np.random.default_rng(0)
    paths = []
    refs = []
    for i in range(5):
        arr = rng.normal(size=(7, 16, 4, 6)).astype(np.float32)
        p = str(tmp_path / f"{i}.npy")
        np.save(p, arr)
        paths.append(p)
        refs.append(arr)
    arrs = load_npy_batch(paths, n_threads=3)
    for got, ref in zip(arrs, refs):
        np.testing.assert_array_equal(got, ref)


def test_missing_file_raises(tmp_path):
    import pytest

    if not native_available():
        pytest.skip("native lib unavailable")
    with pytest.raises((FileNotFoundError, IOError)):
        read_files_batch([str(tmp_path / "missing.npy")])


def test_raw_bytes_read(tmp_path):
    p = str(tmp_path / "blob.bin")
    data = bytes(range(256)) * 10
    with open(p, "wb") as f:
        f.write(data)
    (buf,) = read_files_batch([p])
    assert bytes(buf) == data

"""ctypes bindings for the native latent-store reader (native/latent_store.cpp),
with a pure-python fallback when the shared library isn't built.

Used by the latent/token dataset paths to read shard files with a C++ thread
pool (the training-time IO hot path; the reference's analogous native IO is the
decord decoder)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libtokensgen_native.so",
)
_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> bool:
    """Compile the shared library (idempotent). Returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build_native():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ls_file_size.argtypes = [ctypes.c_char_p]
    lib.ls_file_size.restype = ctypes.c_int64
    lib.ls_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
    ]
    lib.ls_read_batch.restype = ctypes.c_int
    lib.ls_version.argtypes = []
    lib.ls_version.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def read_files_batch(paths: List[str], n_threads: int = 8) -> List[np.ndarray]:
    """Parallel whole-file reads -> list of uint8 arrays (zero extra copies).
    Native thread pool when built, else python."""
    lib = _load()
    if lib is None:
        return [np.fromfile(p, np.uint8) for p in paths]

    n = len(paths)
    sizes = [lib.ls_file_size(p.encode()) for p in paths]
    if any(s < 0 for s in sizes):
        missing = [p for p, s in zip(paths, sizes) if s < 0]
        raise FileNotFoundError(missing[0])
    bufs = [np.empty(s, np.uint8) for s in sizes]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_dests = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs]
    )
    c_sizes = (ctypes.c_int64 * n)(*sizes)
    failures = lib.ls_read_batch(c_paths, n, c_dests, c_sizes, n_threads)
    if failures:
        raise IOError(f"{failures} reads failed")
    return bufs


def _npy_view(buf: np.ndarray) -> np.ndarray:
    """Zero-copy .npy decode: parse the header, view the payload in place."""
    import io
    import numpy.lib.format as fmt

    bio = io.BytesIO(memoryview(buf)[:512].tobytes())
    version = fmt.read_magic(bio)
    shape, fortran, dtype = fmt._read_array_header(bio, version)
    off = bio.tell()
    arr = np.frombuffer(buf.data, dtype=dtype, offset=off)
    return arr.reshape(shape, order="F" if fortran else "C")


def load_npy_batch(paths: List[str], n_threads: int = 8) -> List[np.ndarray]:
    """Parallel .npy loads via the native reader (zero-copy views)."""
    return [_npy_view(buf) for buf in read_files_batch(paths, n_threads)]

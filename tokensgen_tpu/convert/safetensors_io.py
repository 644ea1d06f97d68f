"""Minimal dependency-free safetensors reader/writer (numpy).

Format: 8-byte little-endian header length, JSON header mapping tensor name ->
{dtype, shape, data_offsets}, then raw row-major tensor bytes. Enough to load the
diffusers-format CogVideoX / TokensGen artifacts without the safetensors package.
"""

from __future__ import annotations

import json
import struct
from typing import Dict

import numpy as np

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}
_DTYPES_INV = {np.dtype(v): k for k, v in _DTYPES.items()}


def _bf16_to_f32(raw: bytes, shape) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32).reshape(shape)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        data = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        lo, hi = meta["data_offsets"]
        raw = data[lo:hi]
        if meta["dtype"] == "BF16":
            out[name] = _bf16_to_f32(raw, meta["shape"])
        else:
            out[name] = np.frombuffer(raw, dtype=_DTYPES[meta["dtype"]]).reshape(
                meta["shape"]
            ).copy()
    return out


def save_safetensors(path: str, tensors: Dict[str, np.ndarray]) -> None:
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        blob = arr.tobytes()
        header[name] = {
            "dtype": _DTYPES_INV[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        offset += len(blob)
        blobs.append(blob)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)


def save_param_tree(path: str, tree) -> int:
    """Flax param tree -> one safetensors file ("/"-joined key paths, f32).
    The on-disk format `convert_weights.py` produces and the entry points'
    ``converted_weights_dir`` consumes. Returns the tensor count."""
    import flax

    flat = {
        "/".join(map(str, k)): np.asarray(v, np.float32)
        for k, v in flax.traverse_util.flatten_dict(tree).items()
    }
    save_safetensors(path, flat)
    return len(flat)


def load_param_tree(path: str):
    """Inverse of :func:`save_param_tree`."""
    import flax

    flat = {tuple(k.split("/")): v for k, v in load_safetensors(path).items()}
    return flax.traverse_util.unflatten_dict(flat)

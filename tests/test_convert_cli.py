"""convert_weights.py end-to-end with synthetic reference-layout fixtures."""

import json
import os
import runpy
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _make_fixture_weights(root):
    """Synthesise a reference weights/ dir at tiny scale using our exporters
    (the exporters are separately roundtrip-tested against real naming)."""
    from tokensgen_tpu.convert.export import export_resampler
    from tokensgen_tpu.convert.safetensors_io import save_safetensors
    from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig

    rs_dir = os.path.join(root, "TokensGen-To2V", "resampler")
    os.makedirs(rs_dir, exist_ok=True)
    rcfg = ResamplerConfig(depth=4, dim=16, dim_head=8, heads=2, embedding_dim=8,
                           output_dim=8, num_temporal_queries=2,
                           num_height_queries=2, num_width_queries=2,
                           dtype=jnp.float32)
    rs = Resampler(rcfg)
    params = rs.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 4, 8)))["params"]
    sd = export_resampler(params, rcfg.depth)
    save_safetensors(os.path.join(rs_dir, "model.safetensors"),
                     {k: np.asarray(v, np.float32) for k, v in sd.items()})
    return rcfg


def test_convert_cli_resampler(tmp_path, monkeypatch):
    weights = tmp_path / "weights"
    out = tmp_path / "converted"
    _make_fixture_weights(str(weights))

    monkeypatch.setattr(sys, "argv", [
        "convert_weights.py", "--weights", str(weights), "--out", str(out),
        "--what", "to2v",
    ])
    runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                "convert_weights.py"), run_name="__main__")

    manifest = json.load(open(out / "manifest.json"))
    assert "resampler" in manifest
    # converted tree loads back and matches structure
    sys.path.insert(0, str(tmp_path))
    from convert_weights import load_tree  # noqa: F401 (already importable via repo root)

    tree = load_tree(str(out / "resampler.safetensors"))
    assert "latents" in tree
    assert "layers_0_attn" in tree

"""Serving layer tests (tiny pipeline; request API, caching, stats)."""

import numpy as np
import jax.numpy as jnp

from tokensgen_tpu.models.text_encoder import CachedTextEncoder, HashTextEncoder
from tokensgen_tpu.serving import VideoService


def _service():
    from tests.test_pipeline_to2v import build_tiny_pipe

    pipe = build_tiny_pipe()
    enc = CachedTextEncoder(HashTextEncoder(
        max_length=pipe.dit_config.max_text_seq_length,
        embed_dim=pipe.dit_config.text_embed_dim))
    return VideoService(pipe, enc), pipe


def test_edit_request():
    svc, pipe = _service()
    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)).astype(np.float32)
    out = svc.edit("a red car", frames, num_chunks=2, seed=1)
    assert out["video"].shape == (18, 32, 48, 3)
    assert out["latents"].shape == (1, 6, 16, 4, 6)
    assert np.isfinite(out["video"]).all()
    h = svc.health()
    assert h["status"] == "ok" and h["requests"] == 1
    assert h["avg_seconds"] > 0


def test_chunk_bucketing():
    svc, _ = _service()
    assert svc._bucket(1) == 2
    assert svc._bucket(2) == 2
    assert svc._bucket(3) == 4
    assert svc._bucket(100) == 8

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


def test_edit_stream_matches_edit():
    """Streaming chunks == the one-shot edit()'s latents, in order, and the
    first chunk arrives before the worker finishes the whole video."""
    svc, pipe = _service()
    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)).astype(np.float32)
    ref = svc.edit("a red car", frames, num_chunks=2, seed=1, decode=False)

    chunks = list(svc.edit_stream("a red car", frames, num_chunks=2, seed=1,
                                  decode=False))
    nf = pipe.cfg.nf_latent
    assert [c["chunk"] for c in chunks] == list(range(2))
    streamed = np.concatenate([c["latents"] for c in chunks], axis=1)
    np.testing.assert_allclose(streamed, ref["latents"], rtol=1e-5, atol=1e-5)
    assert streamed.shape[1] == 2 * nf


def test_edit_stream_decoded_chunks():
    svc, pipe = _service()
    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)).astype(np.float32)
    got = 0
    for c in svc.edit_stream("a dog", frames, num_chunks=2, seed=3):
        assert c["video"].shape == (1, 9, 32, 48, 3)
        assert np.isfinite(c["video"]).all()
        got += 1
    assert got == 2


def test_http_edit_stream_endpoint():
    """POST /edit_stream returns NDJSON chunks over a chunked HTTP response."""
    import base64
    import http.client
    import io
    import json
    import threading
    from http.server import HTTPServer

    from tokensgen_tpu.serving import serve_http

    svc, _ = _service()
    # grab the handler class via a private server instance: serve_http blocks,
    # so run it on an ephemeral port in a daemon thread
    import socket
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    t = threading.Thread(target=serve_http, args=(svc, "127.0.0.1", port),
                         daemon=True)
    t.start()
    import time
    time.sleep(0.5)

    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, frames)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", "/edit_stream", body=json.dumps({
        "prompt": "a boat", "num_chunks": 2, "seed": 2,
        "frames_npy": base64.b64encode(buf.getvalue()).decode()}),
        headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "application/x-ndjson"
    lines = [json.loads(l) for l in resp.read().decode().splitlines() if l]
    assert [l["chunk"] for l in lines] == [0, 1]
    for l in lines:
        assert len(base64.b64decode(l["video_mp4_b64"])) > 0
    conn.close()


def test_generate_stream_two_stage():
    """generate_stream: T2To tokens up front, then streamed To2V chunks that
    match the one-shot generate()'s latents."""
    import jax

    from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
    from tokensgen_tpu.pipelines.t2to import T2ToConfig, T2ToPipeline

    svc, pipe = _service()
    # tiny T2To whose token grid matches the To2V resampler queries (24, 2x3)
    t2cfg = T2ToConfig(num_inference_steps=4, num_frames_per_chunk=2,
                       token_dim=24, height=2, width=3, stochastic=False)
    t2dcfg = DiTConfig.tiny(patch_size=1, sample_height=2, sample_width=3,
                            attention_head_dim=64, num_attention_heads=1)
    t2dit = CogVideoXTransformer(t2dcfg)
    t2pipe = T2ToPipeline(t2cfg, t2dcfg, None)
    f0 = 2 * t2cfg.num_frames_per_chunk
    t2params = t2dit.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, f0, t2cfg.latent_channels, 2, 3)),
        jnp.zeros((1, t2dcfg.max_text_seq_length, t2dcfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32), image_rotary_emb=t2pipe.rope(f0))
    import numpy as _np
    from tokensgen_tpu.core import pca as pca_lib
    rng0 = _np.random.default_rng(0)
    pca = pca_lib.fit(jnp.asarray(rng0.normal(size=(24 + 8, 24)), jnp.float32),
                      None)
    svc.t2to_pipe = T2ToPipeline(t2cfg, t2dcfg, t2params, pca=pca,
                                 token_mean=jnp.zeros((1, 24)),
                                 token_std=jnp.ones((1, 24)))
    ref = svc.generate("a blue bird", num_chunks=2, seed=5, decode=False)
    chunks = list(svc.generate_stream("a blue bird", num_chunks=2, seed=5,
                                      decode=False))
    assert [c["chunk"] for c in chunks] == [0, 1]
    streamed = np.concatenate([c["latents"] for c in chunks], axis=1)
    np.testing.assert_allclose(streamed, ref["latents"], rtol=1e-5, atol=1e-5)

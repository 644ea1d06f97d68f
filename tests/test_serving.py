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


def test_edit_stream_sharded():
    """Streaming on the queue-sharded production engine: a 4-device queue
    mesh streams the same chunks the single-device service streams (the
    host-loop lands each iteration's replicated emit on host even when the
    rank windows are fanned out with shard_map)."""
    from tokensgen_tpu.sharding import MeshSpec, make_mesh

    svc_ref, pipe = _service()
    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)).astype(np.float32)
    ref = svc_ref.edit("a red car", frames, num_chunks=2, seed=1, decode=False)

    mesh = make_mesh(MeshSpec(data=1, queue=2 * pipe.cfg.num_partitions))
    svc = VideoService(pipe, svc_ref.text_encoder, mesh=mesh)
    chunks = list(svc.edit_stream("a red car", frames, num_chunks=2, seed=1,
                                  decode=False))
    assert [c["chunk"] for c in chunks] == [0, 1]
    streamed = np.concatenate([c["latents"] for c in chunks], axis=1)
    # sharded engine == single-device engine (same keys, psum merge); the
    # only delta is reduction order
    np.testing.assert_allclose(streamed, ref["latents"], rtol=1e-4, atol=1e-4)


def test_stream_cancellation_frees_service():
    """Abandoning the stream mid-run (client disconnect) cancels the worker
    and releases the service lock — the next request doesn't overlap an
    orphaned generation."""
    svc, pipe = _service()
    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)).astype(np.float32)

    gen = svc.edit_stream("a red car", frames, num_chunks=2, seed=1,
                          decode=False)
    first = next(gen)
    assert first["chunk"] == 0
    gen.close()  # GeneratorExit inside _stream_fifo
    # lock must be free immediately (worker joined in the finally)
    assert svc._lock.acquire(timeout=5)
    svc._lock.release()
    # and a fresh request still works end to end
    out = svc.edit("a red car", frames, num_chunks=2, seed=1, decode=False)
    assert np.isfinite(out["latents"]).all()


def test_crash_resume_drill():
    """Kill the FIFO host loop mid-stream, then resume from the checkpointed
    queue state — the stitched emission series equals the uninterrupted run
    bit-exactly (per-iteration keys derive from the same rng, so iteration
    i's randomness is independent of how the host loop was segmented)."""
    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.models.text_encoder import HashTextEncoder

    _, pipe = _service()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)).astype(np.float32))
    enc = HashTextEncoder(max_length=pipe.dit_config.max_text_seq_length,
                          embed_dim=pipe.dit_config.text_embed_dim)
    text, neg = enc(["a red car"]), enc([""])
    fkw = dict(frames=frames, num_chunks=2, rng=jax.random.PRNGKey(7),
               decode=False, host_loop=True)

    # uninterrupted reference: collect every emitted frame
    full = {}
    pipe.generate(text, neg, **fkw,
                  emit_callback=lambda i, em: full.__setitem__(i, em))
    n_iters = len(full)

    # crash run: emit + state checkpoints, die at iteration 5
    emits, states = {}, {}

    class _Crash(RuntimeError):
        pass

    def on_emit(i, em):
        emits[i] = em
        if i == 5:
            raise _Crash()

    def on_state(i, snapshot):
        if (i + 1) % 2 == 0:  # checkpoint every 2 iterations (lazy fetch)
            states[i] = snapshot()

    import pytest
    with pytest.raises(_Crash):
        pipe.generate(text, neg, **fkw, emit_callback=on_emit,
                      state_callback=on_state)

    # resume from the last state checkpoint before the crash
    resume_i = max(states)
    assert resume_i < 5
    tail = {}
    pipe.generate(text, neg, **fkw, resume_from=states[resume_i],
                  emit_callback=lambda i, em: tail.__setitem__(i, em))
    assert sorted(tail) == list(range(resume_i + 1, n_iters))

    stitched = {**{i: emits[i] for i in range(resume_i + 1)}, **tail}
    assert sorted(stitched) == sorted(full)
    for i in full:
        np.testing.assert_array_equal(stitched[i], full[i])


def test_http_error_paths():
    """Invalid requests are rejected loudly with 400 before chip work."""
    from tokensgen_tpu.serving import RequestError, validate_request

    svc, pipe = _service()
    import pytest

    # num_chunks over the FIFO cap
    with pytest.raises(RequestError, match="out of range"):
        validate_request(svc, {"prompt": "x", "num_chunks": 9999})
    # missing prompt
    with pytest.raises(RequestError, match="prompt"):
        validate_request(svc, {"num_chunks": 2})
    # wrong frame count for num_chunks
    bad = np.zeros((1, 7, 32, 48, 3), np.float32)
    with pytest.raises(RequestError, match="requires"):
        validate_request(svc, {"prompt": "x", "num_chunks": 2}, bad)
    # wrong resolution
    bad = np.zeros((1, 18, 16, 16, 3), np.float32)
    with pytest.raises(RequestError, match="compiled for"):
        validate_request(svc, {"prompt": "x", "num_chunks": 2}, bad)
    # wrong rank
    bad = np.zeros((18, 32, 48, 3), np.float32)
    with pytest.raises(RequestError, match="B, F, H, W"):
        validate_request(svc, {"prompt": "x", "num_chunks": 2}, bad)


def test_http_400_over_the_wire():
    """A bad request through the real HTTP server returns 400 + JSON error."""
    import base64
    import http.client
    import io
    import json
    import socket
    import threading
    import time

    from tokensgen_tpu.serving import serve_http

    svc, _ = _service()
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    t = threading.Thread(target=serve_http, args=(svc, "127.0.0.1", port),
                         daemon=True)
    t.start()
    time.sleep(0.5)

    frames = np.zeros((1, 7, 32, 48, 3), np.float32)  # wrong frame count
    buf = io.BytesIO()
    np.save(buf, frames)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/edit", body=json.dumps({
        "prompt": "x", "num_chunks": 2,
        "frames_npy": base64.b64encode(buf.getvalue()).decode()}),
        headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    err = json.loads(resp.read())
    assert "requires" in err["error"]
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

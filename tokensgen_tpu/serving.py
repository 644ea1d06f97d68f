"""Serving runtime: persistent pipelines behind a request API.

The reference has no serving story (research scripts only); this module provides
the production path the mandate asks for:

* `VideoService` — holds the To2V/T2To pipelines with warm jitted programs,
  caches per-prompt text embeddings, and serves `edit` / `generate` requests;
  request shapes are bucketed to the configured chunk counts so every request
  after the first per bucket hits compiled code,
* `serve_http` — a minimal JSON-over-HTTP front (stdlib http.server; one request
  at a time per chip, which matches the device execution model).
"""

from __future__ import annotations

import base64
import io
import json
import threading
import time
from typing import Dict, Optional

import numpy as np


class VideoService:
    def __init__(self, pipe, text_encoder, t2to_pipe=None,
                 chunk_buckets: tuple = (2, 4, 8), mesh=None):
        self.pipe = pipe
        self.text_encoder = text_encoder
        self.t2to_pipe = t2to_pipe
        self.chunk_buckets = tuple(sorted(chunk_buckets))
        self.mesh = mesh
        self._lock = threading.Lock()
        self.stats: Dict[str, float] = {"requests": 0, "total_s": 0.0}

    def _bucket(self, num_chunks: int) -> int:
        for b in self.chunk_buckets:
            if num_chunks <= b:
                return b
        return self.chunk_buckets[-1]

    def warmup(self, num_chunks: int = 2) -> None:
        """Compile the hot path before serving (first compile is minutes)."""
        import jax.numpy as jnp

        c = self.pipe.cfg
        frames = jnp.zeros(
            (1, num_chunks * c.num_frames_per_chunk, c.height, c.width, 3),
            jnp.float32,
        )
        self.edit(prompt="warmup", frames=np.asarray(frames),
                  num_chunks=num_chunks, decode=False)

    def edit(self, prompt: str, frames: np.ndarray, num_chunks: int,
             seed: int = 0, negative_prompt: str = "", decode: bool = True) -> Dict:
        import jax
        import jax.numpy as jnp

        t0 = time.time()
        with self._lock:
            text = self.text_encoder([prompt])
            neg = self.text_encoder([negative_prompt])
            out = self.pipe.generate(
                text, neg, frames=jnp.asarray(frames), num_chunks=num_chunks,
                rng=jax.random.PRNGKey(seed), mesh=self.mesh, decode=decode,
            )
        dt = time.time() - t0
        self.stats["requests"] += 1
        self.stats["total_s"] += dt
        result = {"latents": np.asarray(out["latents"]), "seconds": dt}
        if decode:
            result["video"] = np.asarray(out["video"][0])
        return result

    def edit_stream(self, prompt: str, frames: np.ndarray, num_chunks: int,
                    seed: int = 0, negative_prompt: str = "",
                    decode: bool = True):
        """Generator form of `edit`: yields one 49-px-frame chunk as soon as
        the FIFO queue has emitted its 13 clean latent frames, instead of
        returning only after the whole video.

        This is the serving mode FIFO diagonal denoising is naturally shaped
        for — the engine pops exactly one finished frame per iteration
        (`cogvideo_sampling_mp_fifo.py:340-341`), so a long video can start
        playing while its tail is still denoising. Built on the host-loop
        engine's per-iteration `emit_callback` (sampling/fifo.py): a worker
        thread drives the FIFO iterations; this generator groups the emitted
        clean latents per chunk and (when `decode=True`) VAE-decodes each
        group between iterations.

        Yields dicts: {"chunk": int, "video": [B, 49, H, W, 3]} (or
        {"chunk", "latents"} when decode=False). Works on the queue-sharded
        production engine too (the host-loop lands each iteration's emitted
        [B,C,H,W] slice — replicated out of the shard_map — on host). On a
        memory-edge chip use decode=False and decode the latent stream
        elsewhere (the VAE must otherwise be resident next to the DiT)."""
        import jax.numpy as jnp

        with self._lock:
            text = self.text_encoder([prompt])
            neg = self.text_encoder([negative_prompt])
        yield from self._stream_fifo(text, neg,
                                     dict(frames=jnp.asarray(frames)),
                                     num_chunks, seed, decode)

    def _stream_fifo(self, text, neg, gen_kwargs: Dict, num_chunks: int,
                     seed: int, decode: bool):
        """Shared streaming driver: run `pipe.generate(host_loop=True)` in a
        worker thread, group the per-iteration clean emits into nf-latent
        chunks, decode each between iterations, yield.

        If the consumer abandons the generator mid-run (client disconnect →
        GeneratorExit), the worker is cancelled at its next emit callback
        (at most one FIFO iteration of extra work) and joined BEFORE the
        service lock is released — no orphaned generation can overlap the
        next request on the chip."""
        import queue as queue_mod
        import jax
        import jax.numpy as jnp

        t0 = time.time()
        cfg = self.pipe.cfg
        nf = cfg.nf_latent
        warmup = cfg.num_inference_steps - nf
        q: "queue_mod.Queue" = queue_mod.Queue()
        _DONE, _ERR = object(), object()
        cancel = threading.Event()

        class _Cancelled(BaseException):
            pass

        def on_emit(i, em):
            if cancel.is_set():
                raise _Cancelled()
            q.put((i, em))

        with self._lock:
            def run():
                try:
                    self.pipe.generate(
                        text, neg, num_chunks=num_chunks,
                        rng=jax.random.PRNGKey(seed),
                        host_loop=True, decode=False, mesh=self.mesh,
                        emit_callback=on_emit,
                        **gen_kwargs)
                    q.put((_DONE, None))
                except _Cancelled:
                    q.put((_DONE, None))
                except BaseException as e:  # surface worker failures
                    q.put((_ERR, e))

            worker = threading.Thread(target=run, daemon=True)
            worker.start()
            try:
                group, chunk_idx = [], 0
                while True:
                    i, em = q.get()
                    if i is _ERR:
                        worker.join()
                        raise em
                    if i is _DONE:
                        break
                    if i < warmup:  # discarded warm-up emissions (`:361-367`)
                        continue
                    group.append(em)  # [B, C, h, w]
                    if len(group) == nf:
                        lat = np.stack(group, axis=1)  # [B, nf, C, h, w]
                        group = []
                        out = {"chunk": chunk_idx}
                        if decode and self.pipe.vae is not None:
                            out["video"] = np.asarray(
                                self.pipe.decode_latents(jnp.asarray(lat)))
                        else:
                            out["latents"] = lat
                        chunk_idx += 1
                        yield out
                self.stats["requests"] += 1
                self.stats["total_s"] += time.time() - t0
            finally:
                cancel.set()
                worker.join()

    def generate_stream(self, prompt: str, num_chunks: int, seed: int = 0,
                        negative_prompt: str = "", decode: bool = True):
        """Generator form of `generate`: T2To produces the condensed-token
        track up front (one 52-step pass over the tiny token latents), then
        the To2V FIFO chunks stream out exactly as in `edit_stream`."""
        import jax
        import jax.numpy as jnp

        if self.t2to_pipe is None:
            raise ValueError("service was built without a T2To pipeline")
        from tokensgen_tpu.pipelines.t2to import extend_generated_tokens

        with self._lock:
            text = self.text_encoder([prompt])
            neg = self.text_encoder([negative_prompt])
            toks = self.t2to_pipe(text, neg, num_chunks=num_chunks,
                                  rng=jax.random.PRNGKey(seed))
            toks = extend_generated_tokens(toks, num_chunks)
            if self.pipe.cfg.use_separate_guidance:
                emb = jnp.concatenate([toks, jnp.zeros_like(toks), toks], axis=0)
            else:
                emb = jnp.concatenate([toks, toks], axis=0)
        yield from self._stream_fifo(text, neg, dict(image_embeddings=emb),
                                     num_chunks, seed, decode)

    def generate(self, prompt: str, num_chunks: int, seed: int = 0,
                 negative_prompt: str = "", decode: bool = True) -> Dict:
        """Text -> long video via T2To tokens + To2V FIFO."""
        import jax
        import jax.numpy as jnp

        if self.t2to_pipe is None:
            raise ValueError("service was built without a T2To pipeline")
        from tokensgen_tpu.pipelines.t2to import extend_generated_tokens

        t0 = time.time()
        with self._lock:
            text = self.text_encoder([prompt])
            neg = self.text_encoder([negative_prompt])
            toks = self.t2to_pipe(text, neg, num_chunks=num_chunks,
                                  rng=jax.random.PRNGKey(seed))
            toks = extend_generated_tokens(toks, num_chunks)
            if self.pipe.cfg.use_separate_guidance:
                emb = jnp.concatenate([toks, jnp.zeros_like(toks), toks], axis=0)
            else:
                emb = jnp.concatenate([toks, toks], axis=0)
            out = self.pipe.generate(
                text, neg, image_embeddings=emb, num_chunks=num_chunks,
                rng=jax.random.PRNGKey(seed), mesh=self.mesh, decode=decode,
            )
        dt = time.time() - t0
        self.stats["requests"] += 1
        self.stats["total_s"] += dt
        result = {"latents": np.asarray(out["latents"]), "seconds": dt}
        if decode:
            result["video"] = np.asarray(out["video"][0])
        return result

    def health(self) -> Dict:
        import jax

        return {
            "status": "ok",
            "backend": jax.default_backend(),
            "devices": jax.device_count(),
            "requests": self.stats["requests"],
            "avg_seconds": (self.stats["total_s"] / self.stats["requests"]
                            if self.stats["requests"] else None),
        }


def _encode_video_b64(video: np.ndarray, fps: float = 10.0) -> str:
    import tempfile

    from tokensgen_tpu.data.video_io import write_video

    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
        write_video(f.name, video, fps=fps)
        return base64.b64encode(open(f.name, "rb").read()).decode()


class RequestError(ValueError):
    """Invalid request payload — maps to HTTP 400 (rejected loudly, before any
    chip work is dispatched)."""


def validate_request(service: VideoService, req: Dict,
                     frames: Optional[np.ndarray] = None,
                     max_chunks: int = 25) -> int:
    """Shape/size gate for serving requests. `max_chunks=25` mirrors the
    reference's FIFO cap (`config/infer/gen.yaml:79-86`); an over-long request
    would otherwise OOM the chip mid-generation instead of failing at the
    door."""
    if not isinstance(req.get("prompt"), str) or not req.get("prompt"):
        raise RequestError("'prompt' must be a non-empty string")
    try:
        num_chunks = int(req.get("num_chunks", 2))
    except (TypeError, ValueError):
        raise RequestError("'num_chunks' must be an integer")
    if not 1 <= num_chunks <= max_chunks:
        raise RequestError(
            f"num_chunks={num_chunks} out of range [1, {max_chunks}] "
            "(FIFO queue cap)")
    if frames is not None:
        cfg = service.pipe.cfg
        want_f = num_chunks * cfg.num_frames_per_chunk
        if frames.ndim != 5 or frames.shape[-1] != 3:
            raise RequestError(
                f"frames must be [B, F, H, W, 3]; got {frames.shape}")
        if frames.shape[1] != want_f:
            raise RequestError(
                f"frames has {frames.shape[1]} frames; num_chunks={num_chunks} "
                f"requires {want_f} ({cfg.num_frames_per_chunk}/chunk)")
        if frames.shape[2] != cfg.height or frames.shape[3] != cfg.width:
            raise RequestError(
                f"frames are {frames.shape[2]}x{frames.shape[3]}; the pipeline "
                f"is compiled for {cfg.height}x{cfg.width}")
    return num_chunks


def serve_http(service: VideoService, host: str = "0.0.0.0", port: int = 8080):
    """Blocking JSON API: POST /edit, POST /generate, POST /edit_stream,
    GET /health. Invalid payloads get 400 before any chip work; mid-stream
    failures end the NDJSON stream with an {"error": ...} line (the chunked
    framing stays intact — a second status line can't be sent once streaming
    has begun)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        # chunked transfer-encoding is only defined for HTTP/1.1; the default
        # HTTP/1.0 status line makes compliant clients ignore the header and
        # deliver raw chunk framing as the body
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, service.health())
            else:
                self._reply(404, {"error": "unknown path"})

        def _decode_frames(self, req: Dict) -> np.ndarray:
            if "frames_npy" not in req:
                raise RequestError("'frames_npy' (base64 .npy) is required")
            try:
                return np.load(io.BytesIO(base64.b64decode(req["frames_npy"])))
            except Exception as e:
                raise RequestError(f"frames_npy is not a valid .npy: {e!r}")

        def do_POST(self):
            streaming_started = False
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path in ("/edit_stream", "/generate_stream"):
                    # NDJSON chunked response: one line per 49-frame chunk as
                    # the FIFO emits it (application/x-ndjson)
                    if self.path == "/edit_stream":
                        arr = self._decode_frames(req)
                        num_chunks = validate_request(service, req, arr)
                        stream = service.edit_stream(
                            req["prompt"], arr, num_chunks,
                            seed=int(req.get("seed", 0)),
                            negative_prompt=req.get("negative_prompt", ""))
                    else:
                        num_chunks = validate_request(service, req)
                        if service.t2to_pipe is None:
                            raise RequestError(
                                "service was built without a T2To pipeline "
                                "(use_2nd_stage)")
                        stream = service.generate_stream(
                            req["prompt"], num_chunks,
                            seed=int(req.get("seed", 0)),
                            negative_prompt=req.get("negative_prompt", ""))
                    self.send_response(200)
                    self.send_header("Content-Type", "application/x-ndjson")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    streaming_started = True

                    def send_line(payload: Dict):
                        line = (json.dumps(payload) + "\n").encode()
                        self.wfile.write(f"{len(line):x}\r\n".encode())
                        self.wfile.write(line + b"\r\n")
                        self.wfile.flush()

                    for c in stream:
                        send_line({"chunk": c["chunk"],
                                   "video_mp4_b64": _encode_video_b64(
                                       c["video"][0])})
                    self.wfile.write(b"0\r\n\r\n")
                    return
                if self.path == "/generate":
                    num_chunks = validate_request(service, req)
                    out = service.generate(
                        req["prompt"], num_chunks,
                        seed=int(req.get("seed", 0)),
                        negative_prompt=req.get("negative_prompt", ""),
                    )
                elif self.path == "/edit":
                    arr = self._decode_frames(req)
                    num_chunks = validate_request(service, req, arr)
                    out = service.edit(
                        req["prompt"], arr, num_chunks,
                        seed=int(req.get("seed", 0)),
                    )
                else:
                    return self._reply(404, {"error": "unknown path"})
                self._reply(200, {
                    "seconds": out["seconds"],
                    "video_mp4_b64": _encode_video_b64(out["video"]),
                })
            except RequestError as e:
                if not streaming_started:
                    self._reply(400, {"error": str(e)})
            except Exception as e:  # serving surface: report, don't crash
                if streaming_started:
                    # headers are gone: finish the NDJSON stream with an error
                    # line + the terminating 0-chunk so the client sees a
                    # well-framed failure instead of corrupt chunking
                    try:
                        line = (json.dumps({"error": repr(e)}) + "\n").encode()
                        self.wfile.write(f"{len(line):x}\r\n".encode())
                        self.wfile.write(line + b"\r\n")
                        self.wfile.write(b"0\r\n\r\n")
                    except OSError:
                        pass  # client already gone
                else:
                    self._reply(500, {"error": repr(e)})

        def log_message(self, *a):
            pass

    print(f"serving on {host}:{port}", flush=True)
    HTTPServer((host, port), Handler).serve_forever()

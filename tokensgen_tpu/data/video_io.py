"""Host-side video ingest (cv2 replaces the reference's decord C++ decoder).

`load_video` mirrors the inference loader (`/root/reference/longvgen/data/
long_video.py:28-76`): fps resampling via index arithmetic, time windowing,
crop/pad to the output resolution, -> float32 [1, F, H, W, 3] in [-1, 1].
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from tokensgen_tpu.data.transforms import ResolutionControl

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def read_frames(path: str, indices: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode the given frame indices (or all frames) -> uint8 [F, H, W, 3] RGB."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    frames = []
    if indices is None:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    else:
        want = set(int(i) for i in indices)
        last = max(want)
        idx = 0
        got = {}
        while idx <= last:
            ok, frame = cap.read()
            if not ok:
                break
            if idx in want:
                got[idx] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            idx += 1
        frames = [got[int(i)] for i in indices if int(i) in got]
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames)


def video_metadata(path: str) -> Tuple[int, float]:
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
    cap.release()
    return n, fps


def load_video(
    path: str,
    sample_fps: float = 10.0,
    start_t: float = 0.0,
    end_t: float = -1.0,
    output_res: Tuple[int, int] = (480, 720),
    pad_to_fit: bool = False,
    crop_to_fit: bool = True,
    max_frames: Optional[int] = None,
) -> np.ndarray:
    """-> float32 [1, F, H, W, 3] in [-1, 1]."""
    n, fps = video_metadata(path)
    start = int(round(start_t * fps))
    end = n if end_t < 0 else min(n, int(round(end_t * fps)))
    step = fps / sample_fps
    idx = np.round(np.arange(start, end, step)).astype(np.int64)
    idx = idx[idx < n]
    if max_frames is not None:
        idx = idx[:max_frames]
    frames = read_frames(path, idx)
    rc = ResolutionControl(output_res, pad_to_fit=pad_to_fit, crop_to_fit=crop_to_fit)
    frames = rc(frames)
    out = frames.astype(np.float32) / 127.5 - 1.0
    return out[None]


def save_videos_grid(
    path: str, videos: np.ndarray, fps: float = 10.0, n_rows: Optional[int] = None
) -> None:
    """Tile a batch of videos into one grid mp4 (`longvgen/utils/util.py`'s
    `save_videos_grid`). ``videos``: [B, F, H, W, 3] float in [-1,1]/[0,1] or uint8.
    """
    b = videos.shape[0]
    if n_rows is None:
        n_rows = int(np.floor(np.sqrt(b))) or 1
    n_cols = -(-b // n_rows)
    pad = n_rows * n_cols - b
    if pad:
        videos = np.concatenate([videos, np.zeros_like(videos[:pad])], axis=0)
    f, h, w, c = videos.shape[1:]
    grid = (
        videos.reshape(n_rows, n_cols, f, h, w, c)
        .transpose(2, 0, 3, 1, 4, 5)
        .reshape(f, n_rows * h, n_cols * w, c)
    )
    write_video(path, grid, fps=fps)


def write_video(path: str, video: np.ndarray, fps: float = 10.0) -> None:
    """[F, H, W, 3] float in [-1,1] or [0,1] (or uint8) -> mp4."""
    if video.dtype != np.uint8:
        v = video
        if v.min() < -0.01:
            v = (v + 1.0) / 2.0
        video = (np.clip(v, 0, 1) * 255).astype(np.uint8)
    f, h, w, _ = video.shape
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for frame in video:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()

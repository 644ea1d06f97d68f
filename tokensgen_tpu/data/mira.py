"""MiraData-style training datasets (host-side numpy pipeline).

Behavioral parity with `/root/reference/longvgen/data/long_video.py`:
* `MiraDataset` (`:467-723`): CSV(`index`, `dense_caption`)-driven, sharded
  `<dir>/<index//1000:09d}/<index>.mp4` layout, fps resample to `sample_fps`,
  random temporal window with the compressed-frame `start_frame_idx`
  (`:637-645`), center rectangle crop, optional scene-detect segment sampling
  (`:606-628`), frames padding to `max_num_chunks` with `valid_num_chunks`
  (`:682-687`), CFG dropout i/t/ti (`:691-700`),
* `VAEMiraDataset` (`:1100-1237`): precomputed per-video VAE latents
  (`<video>_vae_c<NN>` files), zero-padded to max chunks,
* `VIPMiraDataset` (`:945-1099`): precomputed condensed tokens,
* `WebVideoDataset` — WebVid10M-style CSV layout (`data/webvideo.py`).

Decoding uses cv2 (C++-backed; the decord replacement). Items are numpy dicts;
`batch_iterator` collates and can run a background prefetch thread.
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from tokensgen_tpu.data.transforms import resize_for_rectangle_crop
from tokensgen_tpu.data.video_io import read_frames, video_metadata

try:
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None


def mira_video_path(video_dir: str, index: int) -> str:
    return os.path.join(video_dir, f"{index // 1000:09d}", f"{index}.mp4")


def parse_scene_detect_file(path: str, min_native_frames: float):
    """Parse a scene-detect file (`long_video.py:532-553`).

    Each line is ``<video_name> <start,end>|<start,end>|...`` in native frame
    units. Scenes shorter than ``min_native_frames`` are dropped; videos with no
    qualifying scene land on the unqualified list (skipped + resampled at
    ``__getitem__``). Returns ``(scenes: {name: [(start, end), ...]},
    unqualified: set[str])``.
    """
    scenes: Dict[str, List[Tuple[int, int]]] = {}
    unqualified = set()
    with open(path, "r") as f:
        for line in f:
            parts = line.split(" ")
            if len(parts) > 1 and len(parts[1].strip()) != 0:
                name, segs = parts[0], parts[1]
                qualified = []
                for seg in segs.strip().split("|"):
                    start, end = seg.split(",")
                    if int(end) - int(start) > min_native_frames:
                        qualified.append((int(start), int(end)))
                if qualified:
                    scenes[name] = qualified
                else:
                    unqualified.add(name)
    return scenes, unqualified


class MiraDataset:
    def __init__(
        self,
        csv_file: str,
        video_dir: str,
        height: int = 480,
        width: int = 720,
        sample_fps: float = 10.0,
        chunk_size: int = 49,
        max_num_chunks: int = 2,
        random_sample: bool = True,
        random_flip: bool = False,
        index_range: Optional[Tuple[int, int]] = None,
        i_drop_rate: float = 0.05,
        t_drop_rate: float = 0.05,
        ti_drop_rate: float = 0.05,
        use_frames_padding: bool = False,
        use_scene_detect: bool = False,
        scene_detect_file: Optional[str] = None,
        seed: Optional[int] = None,
    ):
        self.video_dir = video_dir
        self.height, self.width = height, width
        self.sample_fps = sample_fps
        self.chunk_size = chunk_size
        self.max_num_chunks = max_num_chunks
        self.random_sample = random_sample
        self.random_flip = random_flip
        self.i_drop_rate = i_drop_rate
        self.t_drop_rate = t_drop_rate
        self.ti_drop_rate = ti_drop_rate
        self.use_frames_padding = use_frames_padding
        self.rng = random.Random(seed)

        df = pd.read_csv(csv_file, encoding="ISO-8859-1")
        if index_range is not None:
            lo = 0 if index_range[0] == -1 else index_range[0]
            hi = df.shape[0] if index_range[1] == -1 else index_range[1]
            df = df.iloc[lo:hi]
        self.df = df.reset_index(drop=True)

        self.use_scene_detect = use_scene_detect
        self.scene_detect: Dict[str, List[Tuple[int, int]]] = {}
        self.unqualified_videos: set = set()
        if use_scene_detect:
            # qualification threshold in native frames, assuming ~30 fps source
            # (`long_video.py:543`)
            min_native = self.max_num_chunks * self.chunk_size / self.sample_fps * 30
            self.scene_detect, self.unqualified_videos = parse_scene_detect_file(
                scene_detect_file, min_native)

    def __len__(self) -> int:
        return len(self.df)

    def _scene_sample_idx(self, scenes, fps: float, want: int) -> np.ndarray:
        """Pick one qualifying scene (probability ∝ its count of valid window
        starts) and return its fps-resampled native-frame index grid
        (`long_video.py:606-628`)."""
        grids, n_starts = [], []
        for start_f, end_f in scenes:
            num_f = int((end_f - start_f) / fps * self.sample_fps)
            grid = np.linspace(start_f, end_f, num_f, endpoint=False).astype(np.int64)
            if len(grid) < want:
                # qualification normally guarantees every kept scene fits a
                # full window; a malformed scene file must not crash the
                # loader — drop the short scene instead
                continue
            grids.append(grid)
            n_starts.append(num_f - want + 1)
        if not grids:
            return None
        cum = np.cumsum([0] + n_starts, dtype=np.float64)
        cum /= max(1.0, cum[-1])
        pick = 0
        if self.random_sample:
            pick = int(np.searchsorted(cum, self.rng.random(), side="right")) - 1
        return grids[pick]

    def __getitem__(self, i: int) -> Dict:
        # unqualified (scene-detect) videos are skipped: resample a random row
        # (`long_video.py:571-580`)
        sample_idx = None
        while True:
            if self.use_scene_detect and len(self.unqualified_videos) >= len(self.df):
                raise RuntimeError("every video is scene-detect-unqualified")
            while (self.use_scene_detect
                   and str(self.df.iloc[i]["index"]) in self.unqualified_videos):
                i = self.rng.randint(0, len(self.df) - 1)
            row = self.df.iloc[i]
            path = mira_video_path(self.video_dir, int(row["index"]))
            n, fps = video_metadata(path)
            want = self.chunk_size * self.max_num_chunks

            scenes = (self.scene_detect.get(str(row["index"]))
                      if self.use_scene_detect else None)
            if scenes:
                sample_idx = self._scene_sample_idx(scenes, fps, want)
                if sample_idx is None:
                    # malformed scene file (no scene fits a full window despite
                    # qualification): skip the row like an unqualified video
                    self.unqualified_videos.add(str(row["index"]))
                    continue
            else:
                num_f = int(n / fps * self.sample_fps)
                sample_idx = np.linspace(0, n, num_f, endpoint=False).astype(np.int64)
            break

        start_idx = 0
        if self.random_sample and len(sample_idx) > want:
            start_idx = self.rng.randint(0, len(sample_idx) - want)
            sample_idx = sample_idx[start_idx:]

        # compressed-frame start index (`long_video.py:637-645`)
        ccs = (self.chunk_size - 1) // 4 + 1
        compressed_start = (
            start_idx // self.chunk_size * ccs
            + int((start_idx % self.chunk_size) / float(self.chunk_size - 1) * (ccs - 1))
        )

        num_chunks = min(len(sample_idx) // self.chunk_size, self.max_num_chunks)
        if num_chunks == 0:
            raise ValueError(f"video too short: {path}")
        sample_idx = sample_idx[: num_chunks * self.chunk_size]

        frames = read_frames(path, sample_idx)  # [F, H, W, 3] uint8
        frames = resize_for_rectangle_crop(
            frames.astype(np.float32) / 255.0, (self.height, self.width)
        )
        pixel_values = frames * 2.0 - 1.0
        if self.random_flip and self.rng.random() < 0.5:
            pixel_values = pixel_values[:, :, ::-1]

        valid_num_chunks = num_chunks
        if self.use_frames_padding and num_chunks < self.max_num_chunks:
            pad = np.repeat(
                pixel_values[-1:], self.chunk_size * (self.max_num_chunks - num_chunks),
                axis=0,
            )
            pixel_values = np.concatenate([pixel_values, pad], axis=0)

        prompt = str(row["dense_caption"])
        drop_image_embed = 0
        r = self.rng.random()
        if r < self.i_drop_rate:
            drop_image_embed = 1
        elif r < self.i_drop_rate + self.t_drop_rate:
            prompt = ""
        elif r < self.i_drop_rate + self.t_drop_rate + self.ti_drop_rate:
            prompt = ""
            drop_image_embed = 1

        out = {
            "pixel_values": np.ascontiguousarray(pixel_values, dtype=np.float32),
            "prompt": prompt,
            "start_frame_idx": compressed_start,
            "video_index": int(row["index"]),
            "drop_image_embed": drop_image_embed,
        }
        if self.use_frames_padding:
            out["valid_num_chunks"] = valid_num_chunks
        return out


class VAEMiraDataset:
    """Precomputed VAE latents: `<latent_dir>/<shard>/<index>_vae_c<NN>.npy`
    with shape [13*chunks, 16, 60, 90]; zero-padded to `max_num_chunks`
    (`long_video.py:1100-1237`)."""

    def __init__(self, csv_file: str, latent_dir: str, max_num_chunks: int = 24,
                 nf_per_chunk: int = 13, t_drop_rate: float = 0.05,
                 seed: Optional[int] = None):
        self.latent_dir = latent_dir
        self.max_num_chunks = max_num_chunks
        self.nf_per_chunk = nf_per_chunk
        self.t_drop_rate = t_drop_rate
        self.rng = random.Random(seed)
        self.df = pd.read_csv(csv_file, encoding="ISO-8859-1").reset_index(drop=True)

    def __len__(self) -> int:
        return len(self.df)

    def _latent_path(self, index: int) -> str:
        shard = os.path.join(self.latent_dir, f"{index // 1000:09d}")
        for name in os.listdir(shard):
            if name.startswith(f"{index}_vae_c"):
                return os.path.join(shard, name)
        raise FileNotFoundError(f"no latents for video {index} in {shard}")

    def load_many(self, idxs: Sequence[int]) -> List[Dict]:
        """Batch fast path: shard files read by the native C++ thread pool
        (`data/native_store.py`; ~9x faster warm than sequential np.load)."""
        from tokensgen_tpu.data.native_store import load_npy_batch

        paths = [self._latent_path(int(self.df.iloc[i]["index"])) for i in idxs]
        arrays = load_npy_batch(paths)
        return [self._make_item(i, lat) for i, lat in zip(idxs, arrays)]

    def __getitem__(self, i: int) -> Dict:
        row = self.df.iloc[i]
        path = self._latent_path(int(row["index"]))
        return self._make_item(i, np.load(path))

    def _make_item(self, i: int, lat: np.ndarray) -> Dict:
        row = self.df.iloc[i]
        chunks = lat.shape[0] // self.nf_per_chunk
        valid = min(chunks, self.max_num_chunks)
        lat = lat[: valid * self.nf_per_chunk]
        if valid < self.max_num_chunks:
            pad = np.zeros(
                ((self.max_num_chunks - valid) * self.nf_per_chunk,) + lat.shape[1:],
                lat.dtype,
            )
            lat = np.concatenate([lat, pad], axis=0)
        prompt = str(row["dense_caption"])
        if self.rng.random() < self.t_drop_rate:
            prompt = ""
        return {
            "vae_latents": lat.astype(np.float32),
            "prompt": prompt,
            "valid_num_chunks": valid,
            "video_index": int(row["index"]),
        }


class VIPMiraDataset:
    """Precomputed condensed tokens `<token_dir>/<shard>/<index>_vip.npy`
    ([4*chunks, 3072, 8, 12]); same padding/caption semantics."""

    def __init__(self, csv_file: str, token_dir: str, max_num_chunks: int = 24,
                 tokens_per_chunk: int = 4, t_drop_rate: float = 0.05,
                 seed: Optional[int] = None):
        self.token_dir = token_dir
        self.max_num_chunks = max_num_chunks
        self.tokens_per_chunk = tokens_per_chunk
        self.t_drop_rate = t_drop_rate
        self.rng = random.Random(seed)
        self.df = pd.read_csv(csv_file, encoding="ISO-8859-1").reset_index(drop=True)

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, i: int) -> Dict:
        row = self.df.iloc[i]
        index = int(row["index"])
        path = os.path.join(self.token_dir, f"{index // 1000:09d}", f"{index}_vip.npy")
        toks = np.load(path)
        chunks = toks.shape[0] // self.tokens_per_chunk
        valid = min(chunks, self.max_num_chunks)
        toks = toks[: valid * self.tokens_per_chunk]
        if valid < self.max_num_chunks:
            pad = np.zeros(
                ((self.max_num_chunks - valid) * self.tokens_per_chunk,) + toks.shape[1:],
                toks.dtype,
            )
            toks = np.concatenate([toks, pad], axis=0)
        prompt = str(row["dense_caption"])
        if self.rng.random() < self.t_drop_rate:
            prompt = ""
        return {
            "vip_tokens": toks.astype(np.float32),
            "prompt": prompt,
            "valid_num_chunks": valid,
            "video_index": index,
        }


class WebVideoDataset:
    """WebVid10M preprocessed-frames dataset (`data/webvideo.py:29-127`).

    The reference's `WebVid10M` reads, per CSV row (`videoid`, `name`, ...):
    * RGB frames `<video_dir>/<videoid>/*_<n>.jpg` (sorted by the frame number
      after the last `_`, first `sample_n_frames` kept),
    * depth frames `<depth_dir>/<videoid>/` in the same layout,
    * a scalar motion value `<motion_dir>/<videoid>/<videoid>_average_motion.txt`,
    re-drawing a random row when any of the three is missing or short
    (`:82-94`). Frames come back center-cropped/resized to ``sample_size`` and
    normalized to [-1, 1] (mean/std 0.5, `:50-54`).
    """

    def __init__(self, csv_file: str, video_dir: str,
                 depth_dir: Optional[str] = None,
                 motion_dir: Optional[str] = None,
                 sample_size: int = 256, sample_n_frames: int = 14,
                 seed: int = 0):
        self.video_dir = video_dir
        self.depth_dir = depth_dir or video_dir
        self.motion_dir = motion_dir or video_dir
        self.sample_size = ((sample_size, sample_size)
                            if isinstance(sample_size, int) else tuple(sample_size))
        self.sample_n_frames = sample_n_frames
        self.df = pd.read_csv(csv_file).reset_index(drop=True)
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.df)

    @staticmethod
    def _frame_no(name: str) -> int:
        return int(name.rsplit("_", 1)[1].split(".")[0])

    def _load_frames(self, folder: str) -> np.ndarray:
        import cv2

        names = sorted(os.listdir(folder), key=self._frame_no)[:self.sample_n_frames]
        frames = []
        for n in names:
            img = cv2.imread(os.path.join(folder, n), cv2.IMREAD_COLOR)
            frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        return np.stack(frames)  # [F, H, W, 3] uint8

    def _crop_resize(self, frames: np.ndarray) -> np.ndarray:
        import cv2

        f, h, w, _ = frames.shape
        m = min(h, w)
        top, left = (h - m) // 2, (w - m) // 2
        frames = frames[:, top:top + m, left:left + m]
        th, tw = self.sample_size
        if (m, m) != (th, tw):
            frames = np.stack(
                [cv2.resize(fr, (tw, th), interpolation=cv2.INTER_LINEAR)
                 for fr in frames])
        return frames

    def __getitem__(self, idx: int) -> Dict:
        for _ in range(8 * len(self.df) + 8):
            row = self.df.iloc[idx]
            vid = str(row["videoid"])
            frame_dir = os.path.join(self.video_dir, vid)
            depth_dir = os.path.join(self.depth_dir, vid)
            motion_file = os.path.join(self.motion_dir, vid,
                                       f"{vid}_average_motion.txt")
            ok = (os.path.isdir(frame_dir) and os.path.isdir(depth_dir)
                  and os.path.isfile(motion_file)
                  and len(os.listdir(frame_dir)) >= self.sample_n_frames
                  and len(os.listdir(depth_dir)) >= self.sample_n_frames)
            if ok:
                break
            idx = self.rng.randrange(len(self.df))  # re-draw (`:82-94`)
        else:
            raise RuntimeError("no qualified WebVid item found")

        px = self._crop_resize(self._load_frames(frame_dir))
        depth = self._crop_resize(self._load_frames(depth_dir))
        with open(motion_file) as fh:
            motion = float(fh.read().strip())
        to_chw = lambda x: (x.transpose(0, 3, 1, 2).astype(np.float32) / 255.0
                            - 0.5) / 0.5
        return {
            "pixel_values": to_chw(px),         # [F, 3, H, W] in [-1, 1]
            "depth_pixel_values": to_chw(depth),
            "motion_values": motion,
            "caption": str(row.get("name", "")),
            "videoid": vid,
        }


def collate(items: Sequence[Dict]) -> Dict:
    out: Dict = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


def batch_iterator(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    num_shards: int = 1,
    shard_index: int = 0,
    prefetch: int = 2,
    num_workers: int = 0,
) -> Iterator[Dict]:
    """Shuffled, host-sharded, background-prefetched batch stream (replaces the
    accelerate DataLoader; per-host sharding covers the DDP split).

    ``num_workers``: decode-pool threads mapping ``dataset[i]`` concurrently
    (cv2 decode/resize release the GIL) with a bounded in-flight window —
    the reference's multi-worker DataLoader equivalent
    (`train_cogvideo_to2v.py:1540-1550`). Measured (tools/
    bench_data_pipeline.py, numbers in PERF.md): one sequential decoder
    falls SHORT of the 0.123 items/s training-step budget at the production
    2x49-frame 720x480 shape; the pool is the multi-core scaling mechanism
    (throughput scales with host cores — cv2's decode loop drops the GIL).
    """
    order = list(range(len(dataset)))
    rng = random.Random(seed)
    if shuffle:
        rng.shuffle(order)
    order = order[shard_index::num_shards]

    def gen():
        batch = []
        use_batch_load = hasattr(dataset, "load_many")
        if use_batch_load:
            for lo in range(0, len(order), batch_size):
                idxs = order[lo:lo + batch_size]
                if len(idxs) < batch_size and drop_last:
                    break
                try:
                    yield collate(dataset.load_many(idxs))
                except (IOError, ValueError, FileNotFoundError):
                    continue
            return
        if num_workers > 0:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            def try_get(i):
                try:
                    return dataset[i]
                except (IOError, ValueError, FileNotFoundError):
                    return None  # retry-on-unqualified semantics: skip

            with ThreadPoolExecutor(num_workers) as ex:
                it = iter(order)
                inflight = deque()

                def submit_next():
                    i = next(it, None)
                    if i is not None:
                        inflight.append(ex.submit(try_get, i))

                for _ in range(max(num_workers + 1, batch_size)):
                    submit_next()
                while inflight:
                    item = inflight.popleft().result()
                    submit_next()
                    if item is None:
                        continue
                    batch.append(item)
                    if len(batch) == batch_size:
                        yield collate(batch)
                        batch = []
            if batch and not drop_last:
                yield collate(batch)
            return
        for i in order:
            try:
                batch.append(dataset[i])
            except (IOError, ValueError, FileNotFoundError):
                continue  # retry-on-unqualified-video (`long_video.py:571-580`)
            if len(batch) == batch_size:
                yield collate(batch)
                batch = []
        if batch and not drop_last:
            yield collate(batch)

    if prefetch <= 0:
        yield from gen()
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _END = object()

    def worker():
        try:
            for item in gen():
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item

"""Host input-pipeline throughput at production To2V shapes (VERDICT r3 item 5).

Synthesizes MiraData-layout videos (720x480, ~11s @10fps -> 2x49-frame chunks
per item), then measures `MiraDataset` + `batch_iterator` items/s against the
training-step budget (~16.3 s/step/chip at bs 2 -> the loader must sustain
>= 0.12 items/s with 2x headroom >= 0.25 items/s). Replaces the reference's
multi-worker DataLoader measurement (`train_cogvideo_to2v.py:1540-1550`).

Usage: python tools/bench_data_pipeline.py [n_videos] [batch_size] [workers]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthesize(root: str, n_videos: int, frames: int = 110,
               h: int = 480, w: int = 720) -> str:
    import cv2

    os.makedirs(root, exist_ok=True)
    csv_path = os.path.join(root, "index.csv")
    rows = ["index,dense_caption"]
    rng = np.random.default_rng(0)
    # structured frames (gradients + noise) so the codec does realistic work
    yy, xx = np.mgrid[0:h, 0:w]
    for vid in range(n_videos):
        shard = os.path.join(root, f"{vid // 1000:09d}")
        os.makedirs(shard, exist_ok=True)
        path = os.path.join(shard, f"{vid}.mp4")
        if not os.path.exists(path):
            wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                                 (w, h))
            phase = rng.uniform(0, 6.28)
            for f in range(frames):
                img = (127 + 60 * np.sin(xx / 40 + f / 5 + phase)
                       + 40 * np.cos(yy / 30 - f / 7)
                       + rng.normal(0, 12, size=(h, w)))
                frame = np.clip(img, 0, 255).astype(np.uint8)
                wr.write(np.stack([frame] * 3, axis=-1))
            wr.release()
        rows.append(f"{vid},synthetic clip {vid}")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows))
    return csv_path


def main():
    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from tokensgen_tpu.data import MiraDataset, batch_iterator

    root = "/tmp/bench_data_pipeline"
    t0 = time.time()
    csv_path = synthesize(root, n_videos)
    print(f"synthesized {n_videos} videos in {time.time()-t0:.1f}s", flush=True)

    ds = MiraDataset(csv_path, root, height=480, width=720, sample_fps=10,
                     chunk_size=49, max_num_chunks=2, random_sample=True,
                     seed=0)

    _ = ds[0]  # warm one item (container open caches, numpy pools)
    t0 = time.time()
    n_items = 0
    for epoch in range(3):
        for batch in batch_iterator(ds, batch_size, seed=epoch, prefetch=2,
                                    num_workers=workers):
            n_items += batch["pixel_values"].shape[0]
    dt = time.time() - t0
    rate = n_items / dt
    budget = batch_size / 16.3  # items/s the 16.3 s/step loop consumes
    print(f"{n_items} items in {dt:.1f}s -> {rate:.3f} items/s "
          f"({rate/budget:.1f}x the {budget:.3f} items/s step budget, "
          f"workers={workers})", flush=True)


if __name__ == "__main__":
    main()

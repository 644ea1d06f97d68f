"""Data layer tests with synthetic videos (cv2-backed IO)."""

import os

import numpy as np
import pytest

from tokensgen_tpu.data import (
    MiraDataset, VAEMiraDataset, batch_iterator, collate,
    load_video, read_frames, write_video,
)
from tokensgen_tpu.data.transforms import ResolutionControl, resize_for_rectangle_crop


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mira")
    shard = root / "000000000"
    shard.mkdir()
    rng = np.random.default_rng(0)
    for idx in (1, 2):
        frames = (rng.uniform(0, 255, size=(120, 64, 96, 3))).astype(np.uint8)
        write_video(str(shard / f"{idx}.mp4"), frames, fps=30.0)
    csv = root / "index.csv"
    csv.write_text("index,dense_caption\n1,a red car\n2,a blue sky\n")
    return root


def test_write_read_roundtrip(video_dir):
    path = str(video_dir / "000000000" / "1.mp4")
    frames = read_frames(path)
    assert frames.shape[1:] == (64, 96, 3)
    assert frames.shape[0] > 100


def test_load_video_fps_resample(video_dir):
    path = str(video_dir / "000000000" / "1.mp4")
    out = load_video(path, sample_fps=10.0, output_res=(32, 48))
    # 120 frames @30fps -> 4s -> ~40 frames @10fps
    assert out.shape[0] == 1
    assert abs(out.shape[1] - 40) <= 1
    assert out.shape[2:] == (32, 48, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_resize_for_rectangle_crop():
    frames = np.zeros((2, 50, 100, 3), np.float32)
    out = resize_for_rectangle_crop(frames, (48, 48))
    assert out.shape == (2, 48, 48, 3)


def test_resolution_control_pad_inverse():
    rc = ResolutionControl((64, 64), pad_to_fit=True, crop_to_fit=False)
    frames = np.random.default_rng(1).uniform(size=(2, 32, 64, 3)).astype(np.float32)
    out = rc(frames)
    assert out.shape == (2, 64, 64, 3)
    back = rc.inverse(out)
    assert back.shape == (2, 32, 64, 3)
    np.testing.assert_allclose(back, frames, atol=0.2)


def test_mira_dataset(video_dir):
    ds = MiraDataset(
        str(video_dir / "index.csv"), str(video_dir), height=32, width=48,
        sample_fps=10.0, chunk_size=9, max_num_chunks=2, seed=0,
        use_frames_padding=True,
    )
    assert len(ds) == 2
    item = ds[0]
    assert item["pixel_values"].shape == (18, 32, 48, 3)
    assert item["prompt"] in ("a red car", "")
    assert item["valid_num_chunks"] == 2
    assert "start_frame_idx" in item


def test_mira_scene_detect(video_dir, tmp_path):
    """Scene-detect sampling: frames come only from qualifying scenes; videos
    with no qualifying scene are skipped and resampled (`long_video.py:532-628`)."""
    from tokensgen_tpu.data.mira import parse_scene_detect_file

    # chunk 9 x 2 chunks @10fps -> min native scene length 54 frames @30fps
    scene_file = tmp_path / "scenes.txt"
    scene_file.write_text(
        "1 10,100|0,5\n"   # one qualifying scene (90 frames), one too short
        "2 0,20|40,60\n"   # nothing qualifies -> unqualified
    )
    scenes, unq = parse_scene_detect_file(str(scene_file), 54)
    assert scenes == {"1": [(10, 100)]}
    assert unq == {"2"}

    ds = MiraDataset(
        str(video_dir / "index.csv"), str(video_dir), height=32, width=48,
        sample_fps=10.0, chunk_size=9, max_num_chunks=2, seed=0,
        use_scene_detect=True, scene_detect_file=str(scene_file),
    )
    for i in range(2):  # index 1 qualifies; index 2 must be resampled to 1
        item = ds[i]
        assert item["video_index"] == 1
        assert item["pixel_values"].shape == (18, 32, 48, 3)

    # the sampled window lies inside the scene: native frames [10, 100)
    grid = ds._scene_sample_idx([(10, 100)], fps=30.0, want=18)
    assert grid.min() >= 10 and grid.max() < 100
    assert len(grid) == 30  # 90 frames @30fps -> 3s -> 30 samples @10fps


def test_vae_mira_dataset(video_dir, tmp_path):
    lat_dir = tmp_path / "latents" / "000000000"
    lat_dir.mkdir(parents=True)
    rng = np.random.default_rng(2)
    np.save(lat_dir / "1_vae_c02.npy", rng.normal(size=(26, 16, 4, 6)).astype(np.float32))
    ds = VAEMiraDataset(str(video_dir / "index.csv"), str(tmp_path / "latents"),
                        max_num_chunks=4, seed=0)
    item = ds[0]
    assert item["vae_latents"].shape == (52, 16, 4, 6)
    assert item["valid_num_chunks"] == 2
    # padded region is zero
    assert np.abs(item["vae_latents"][26:]).sum() == 0


def test_batch_iterator(video_dir):
    ds = MiraDataset(
        str(video_dir / "index.csv"), str(video_dir), height=32, width=48,
        sample_fps=10.0, chunk_size=9, max_num_chunks=1, seed=0,
    )
    batches = list(batch_iterator(ds, batch_size=2, seed=1, prefetch=2))
    assert len(batches) == 1
    assert batches[0]["pixel_values"].shape == (2, 9, 32, 48, 3)
    assert len(batches[0]["prompt"]) == 2


def test_batch_iterator_num_workers(video_dir):
    """Decode-pool path yields the same batches (same order) as sequential —
    the pool is a throughput change only."""
    ds = MiraDataset(
        str(video_dir / "index.csv"), str(video_dir), height=32, width=48,
        sample_fps=10.0, chunk_size=9, max_num_chunks=1, seed=0,
        random_sample=False, i_drop_rate=0, t_drop_rate=0, ti_drop_rate=0,
    )
    seq = list(batch_iterator(ds, 2, seed=1, prefetch=0))
    par = list(batch_iterator(ds, 2, seed=1, prefetch=0, num_workers=3))
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        np.testing.assert_array_equal(a["pixel_values"], b["pixel_values"])
        assert list(a["video_index"]) == list(b["video_index"])


def test_batch_iterator_num_workers_skips_bad_items(video_dir, tmp_path):
    """A worker hitting an unreadable video skips it (retry-on-unqualified
    semantics, `long_video.py:571-580`) instead of crashing the stream."""
    import shutil

    root = tmp_path / "vids"
    shutil.copytree(video_dir, root)
    # corrupt one shard file
    bad = next(root.glob("*/*.mp4"))
    bad.write_bytes(b"not a video")
    ds = MiraDataset(
        str(root / "index.csv"), str(root), height=32, width=48,
        sample_fps=10.0, chunk_size=9, max_num_chunks=1, seed=0,
    )
    batches = list(batch_iterator(ds, 1, seed=1, prefetch=0, num_workers=2,
                                  drop_last=False))
    total = sum(b["pixel_values"].shape[0] for b in batches)
    assert total == len(ds) - 1


def test_batch_iterator_sharding(video_dir):
    ds = MiraDataset(
        str(video_dir / "index.csv"), str(video_dir), height=32, width=48,
        sample_fps=10.0, chunk_size=9, max_num_chunks=1, seed=0,
    )
    b0 = list(batch_iterator(ds, 1, seed=2, num_shards=2, shard_index=0))
    b1 = list(batch_iterator(ds, 1, seed=2, num_shards=2, shard_index=1))
    assert len(b0) == 1 and len(b1) == 1
    assert b0[0]["video_index"][0] != b1[0]["video_index"][0]


def test_save_videos_grid(tmp_path):
    pytest.importorskip("cv2")
    from tokensgen_tpu.data.video_io import read_frames, save_videos_grid

    vids = np.random.default_rng(0).uniform(-1, 1, size=(3, 4, 32, 48, 3)).astype(np.float32)
    out = str(tmp_path / "grid.mp4")
    save_videos_grid(out, vids, fps=4.0)
    frames = read_frames(out)
    assert frames.shape == (4, 32, 144, 3)  # n_rows=floor(sqrt(3))=1, 3 cols


def test_mira_malformed_scene_file_skips_row(video_dir, tmp_path):
    """A scene that passes qualification but can't fit one full window (a
    malformed/inconsistent scene file) must skip the row, not crash."""
    scene_file = tmp_path / "scenes_bad.txt"
    # video 1: scene passes the native-length qualification (>=54 native
    # frames) but claims a fps far off -> window doesn't fit; video 2 is fine
    scene_file.write_text(
        "1 0,55\n"         # 55 native frames >= 54 qualifies, but 55/30*10=18
        "2 10,100\n"       # 90 frames -> 30 sampled -> fits want=18
    )
    from tokensgen_tpu.data import MiraDataset

    ds = MiraDataset(
        str(video_dir / "index.csv"), str(video_dir), height=32, width=48,
        sample_fps=10.0, chunk_size=9, max_num_chunks=2, seed=0,
        use_scene_detect=True, scene_detect_file=str(scene_file),
    )
    # force the short-scene case: 55 native frames -> grid of 18 == want is ok;
    # shrink to 50 via a direct call to check the None path
    assert ds._scene_sample_idx([(0, 50)], fps=30.0, want=18) is None
    item = ds[0]  # row 1's scene grid (18) fits exactly; must not crash
    assert item["pixel_values"].shape == (18, 32, 48, 3)


def test_webvid_dataset(tmp_path):
    """WebVid10M preprocessed-frame loader (`data/webvideo.py:29-127`): frames +
    depth + motion value, [-1,1] CHW, skip-and-redraw on missing items."""
    import cv2

    from tokensgen_tpu.data.mira import WebVideoDataset

    rng = np.random.default_rng(0)
    root = tmp_path
    (root / "videos").mkdir()
    (root / "depth").mkdir()
    (root / "motion").mkdir()
    for vid in ("a1",):
        fd = root / "videos" / vid
        dd = root / "depth" / vid
        md = root / "motion" / vid
        fd.mkdir(); dd.mkdir(); md.mkdir()
        for n in range(14):
            img = rng.integers(0, 255, size=(40, 60, 3), dtype=np.uint8)
            cv2.imwrite(str(fd / f"frame_{n}.jpg"), img)
            cv2.imwrite(str(dd / f"frame_{n}.jpg"), img)
        (md / f"{vid}_average_motion.txt").write_text("0.75\n")
    csv = root / "webvid.csv"
    # row b2 has no frames on disk -> must redraw to a1
    csv.write_text("videoid,name\na1,a cat\nb2,missing\n")

    ds = WebVideoDataset(str(csv), str(root / "videos"),
                         depth_dir=str(root / "depth"),
                         motion_dir=str(root / "motion"),
                         sample_size=32, sample_n_frames=14)
    assert len(ds) == 2
    for i in range(2):
        item = ds[i]
        assert item["videoid"] == "a1"
        assert item["pixel_values"].shape == (14, 3, 32, 32)
        assert item["depth_pixel_values"].shape == (14, 3, 32, 32)
        assert -1.0 <= item["pixel_values"].min() <= item["pixel_values"].max() <= 1.0
        assert item["motion_values"] == 0.75
        assert item["caption"] == "a cat"

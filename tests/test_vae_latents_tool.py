"""calculate_vae_latents.py end-to-end: precompute -> VAEMiraDataset reads it."""

import os
import runpy
import sys

import numpy as np
import yaml


def test_precompute_then_dataset(tmp_path, monkeypatch):
    from tokensgen_tpu.data.video_io import write_video

    # synthetic mira layout: 1 video, 2 chunks of 9 frames @10fps
    shard = tmp_path / "videos" / "000000000"
    shard.mkdir(parents=True)
    rng = np.random.default_rng(0)
    write_video(str(shard / "7.mp4"),
                rng.uniform(0, 255, size=(40, 64, 96, 3)).astype(np.uint8), fps=10)
    csv = tmp_path / "index.csv"
    csv.write_text("index,dense_caption\n7,a test video\n")

    cfg = {
        "latent_output_dir": str(tmp_path / "latents"),
        "train_data_params": {
            "csv_file": str(csv),
            "video_dir": str(tmp_path / "videos"),
            "sample_fps": 10,
            "max_num_chunks": 4,
        },
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.setattr(sys, "argv", [
        "calculate_vae_latents.py", "--config", str(cfg_path), "--smoke",
        "--fit-stats",
    ])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runpy.run_path(os.path.join(repo, "calculate_vae_latents.py"),
                   run_name="__main__")

    # shard written: 40 frames @ chunk 9 -> 4 chunks x 3 latent frames
    out_shard = tmp_path / "latents" / "000000000"
    files = os.listdir(out_shard)
    assert any(f.startswith("7_vae_c") for f in files)
    lat = np.load(out_shard / [f for f in files if f.startswith("7_vae_c")][0])
    assert lat.shape == (12, 16, 4, 6)
    assert os.path.exists(tmp_path / "latents" / "mean_shard0.npy")

    # the dataset consumes it (incl. the native batch-load fast path)
    from tokensgen_tpu.data import VAEMiraDataset, batch_iterator

    ds = VAEMiraDataset(str(csv), str(tmp_path / "latents"), max_num_chunks=6,
                        nf_per_chunk=3, t_drop_rate=0.0)
    item = ds[0]
    assert item["vae_latents"].shape == (18, 16, 4, 6)
    assert item["valid_num_chunks"] == 4
    batches = list(batch_iterator(ds, 1, shuffle=False, drop_last=False))
    assert batches[0]["vae_latents"].shape == (1, 18, 16, 4, 6)

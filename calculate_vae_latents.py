"""VAE-latents precompute tool.

TPU-native counterpart of `accelerate launch calculate_vae_latents.py`
(`/root/reference/calculate_vae_latents.py:1618-1651,1799-1821`): for each long
video (chunks x 49 frames), VAE-encode per chunk -> [13*chunks, 16, h, w], save
`<shard>/<index>_vae_c<NN>.npy` per item for `VAEMiraDataset`. Host sharding
(`--num-shards/--shard-index`) replaces the accelerate rank split. Also
accumulates the token-space mean/std used by T2To normalisation
(`calculate_vae_latents.py:1867-1878`) when `--fit-stats` is set.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    from tokensgen_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # make JAX_PLATFORMS effective despite the pinned plugin
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--shard-index", type=int, default=0)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--fit-stats", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.data import MiraDataset
    from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner, sample_latent
    from tokensgen_tpu.utils.config import load_config

    cfg = load_config(args.config)
    out_dir = cfg.get("latent_output_dir", "./latents")
    os.makedirs(out_dir, exist_ok=True)

    if args.smoke:
        vcfg = VAEConfig.tiny(sample_height=32, sample_width=48)
        height, width, nf_px = 32, 48, 9
    else:
        vcfg = VAEConfig.cogvideox()
        height = cfg.get_path("train_data_params.height", 480)
        width = cfg.get_path("train_data_params.width", 720)
        nf_px = cfg.get_path("train_data_params.chunk_size", 49)

    # VAE weights: `vae_checkpoint` may be a convert_weights.py export
    # (vae.safetensors, our layout) or an HF torch `CogVideoX-5b/vae` dir.
    # A configured-but-missing path must FAIL in a non-smoke run — random-init
    # latents written as T2To training data would be silent garbage.
    vae_ckpt = cfg.get("vae_checkpoint")
    vae_params = None
    if vae_ckpt and not args.smoke:
        if os.path.isfile(vae_ckpt):
            from tokensgen_tpu.convert.safetensors_io import load_param_tree

            vae_params = {"params": load_param_tree(vae_ckpt)}
        elif os.path.isdir(vae_ckpt):
            from tokensgen_tpu.convert.safetensors_io import load_safetensors
            from tokensgen_tpu.convert.torch_weights import convert_vae

            sd = {}
            for name in sorted(os.listdir(vae_ckpt)):
                if name.endswith(".safetensors"):
                    sd.update(load_safetensors(os.path.join(vae_ckpt, name)))
            if not sd:
                raise FileNotFoundError(
                    f"vae_checkpoint dir has no .safetensors: {vae_ckpt}")
            vae_params = {"params": convert_vae(sd, vcfg)}
        else:
            raise FileNotFoundError(
                f"vae_checkpoint not found: {vae_ckpt} (unset the key or fix "
                "the path — random-VAE latents are not usable training data)")
        print(f"loaded VAE weights from {vae_ckpt}", flush=True)
    elif not args.smoke:
        raise ValueError(
            "no `vae_checkpoint` configured: non-smoke latent precompute "
            "requires converted CogVideoX VAE weights (--smoke runs "
            "random-init for pipeline tests)")
    vae_model = AutoencoderKLCogVideoX(vcfg)
    if vae_params is None:
        vae_params = vae_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, nf_px, height, width, 3)))
    vae = VAERunner(vcfg, vae_params)

    ds = MiraDataset(
        cfg.get_path("train_data_params.csv_file"),
        cfg.get_path("train_data_params.video_dir"),
        height=height, width=width,
        sample_fps=cfg.get_path("train_data_params.sample_fps", 10),
        chunk_size=nf_px,
        max_num_chunks=cfg.get_path("train_data_params.max_num_chunks", 25),
        random_sample=False, i_drop_rate=0, t_drop_rate=0, ti_drop_rate=0,
    )

    stats_sum, stats_sq, stats_n = None, None, 0
    for i in range(args.shard_index, len(ds), args.num_shards):
        try:
            item = ds[i]
        except (IOError, ValueError):
            continue
        pixels = jnp.asarray(item["pixel_values"])[None]
        chunks = pixels.shape[1] // nf_px
        lats = []
        for cid in range(chunks):
            moments = vae.encode(pixels[:, cid * nf_px:(cid + 1) * nf_px])
            lat = sample_latent(moments, jax.random.PRNGKey(i * 100 + cid))
            lat = lat * vae.config.scaling_factor
            lats.append(np.asarray(lat.transpose(0, 1, 4, 2, 3))[0])
        lat_all = np.concatenate(lats, axis=0)  # [13*chunks, 16, h, w]

        index = item["video_index"]
        shard_dir = os.path.join(out_dir, f"{index // 1000:09d}")
        os.makedirs(shard_dir, exist_ok=True)
        # f16 on disk (halves the store; VAEMiraDataset re-casts to f32)
        np.save(os.path.join(shard_dir, f"{index}_vae_c{chunks:02d}.npy"),
                lat_all.astype(np.float16))
        print(f"[{i}] video {index}: {lat_all.shape} saved", flush=True)

        if args.fit_stats:
            flat = lat_all.reshape(lat_all.shape[0], -1)
            s = flat.sum(0)
            stats_sum = s if stats_sum is None else stats_sum + s
            sq = (flat**2).sum(0)
            stats_sq = sq if stats_sq is None else stats_sq + sq
            stats_n += flat.shape[0]

    if args.fit_stats and stats_n:
        mean = stats_sum / stats_n
        std = np.sqrt(stats_sq / stats_n - mean**2)
        np.save(os.path.join(out_dir, f"mean_shard{args.shard_index}.npy"), mean)
        np.save(os.path.join(out_dir, f"std_shard{args.shard_index}.npy"), std)
    print("done", flush=True)


if __name__ == "__main__":
    main()

"""Convert reference (diffusers/torch) TokensGen weights to this framework.

Input layout (SURVEY §5.4 / `README.md:59-60` of the reference):

  weights/
    CogVideoX-5b/{transformer/*.safetensors, vae/*.safetensors,
                  text_encoder/*.safetensors + spiece.model, ...}
    TokensGen-To2V/{vip.pt, resampler/*.safetensors|*.bin,
                    mean.pt, std.pt, pca.pt}
    TokensGen-T2To/transformer/*.safetensors

Output: `<out>/` with flax param trees saved as .safetensors (flattened with
'/'-joined keys) + a manifest.json, loadable by `infer.py` / the trainers.

Usage:
  python convert_weights.py --weights weights/ --out converted/ [--what all]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _load_dir_safetensors(d):
    from tokensgen_tpu.convert.safetensors_io import load_safetensors

    sd = {}
    if not os.path.isdir(d):
        return sd
    for name in sorted(os.listdir(d)):
        if name.endswith(".safetensors"):
            sd.update(load_safetensors(os.path.join(d, name)))
    return sd


def _save_tree(path, tree):
    from tokensgen_tpu.convert.safetensors_io import save_param_tree

    return save_param_tree(path, tree)


def load_tree(path):
    """Inverse of `_save_tree` (used by infer.py / trainers)."""
    from tokensgen_tpu.convert.safetensors_io import load_param_tree

    return load_param_tree(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--what", default="all",
                    choices=["all", "to2v", "t2to", "vae", "t5"])
    args = ap.parse_args()

    from tokensgen_tpu.convert import torch_weights as C
    from tokensgen_tpu.models.dit import DiTConfig, VIPConfig
    from tokensgen_tpu.models.resampler import ResamplerConfig
    from tokensgen_tpu.models.vae3d import VAEConfig

    os.makedirs(args.out, exist_ok=True)
    manifest = {}

    base = os.path.join(args.weights, "CogVideoX-5b")
    to2v = os.path.join(args.weights, "TokensGen-To2V")
    t2to = os.path.join(args.weights, "TokensGen-T2To")

    if args.what in ("all", "to2v"):
        sd = _load_dir_safetensors(os.path.join(base, "transformer"))
        if sd:
            vip_pt = os.path.join(to2v, "vip.pt")
            if os.path.exists(vip_pt):
                sd = C.merge_vip_state_dict(sd, C.load_torch_state_dict(vip_pt))
                cfg = DiTConfig.cogvideox_5b(vip=VIPConfig())
            else:
                cfg = DiTConfig.cogvideox_5b()
            params = C.convert_dit(sd, cfg)
            n = _save_tree(os.path.join(args.out, "to2v_dit.safetensors"), params)
            manifest["to2v_dit"] = {"tensors": n, "vip": os.path.exists(vip_pt)}
            print(f"to2v_dit: {n} tensors", flush=True)
        rs_dir = os.path.join(to2v, "resampler")
        rs_sd = _load_dir_safetensors(rs_dir)
        if not rs_sd:
            for name in ("diffusion_pytorch_model.bin", "resampler.pt"):
                p = os.path.join(rs_dir, name)
                if os.path.exists(p):
                    rs_sd = C.load_torch_state_dict(p)
                    break
        if rs_sd:
            params = C.convert_resampler(rs_sd, ResamplerConfig().depth)
            n = _save_tree(os.path.join(args.out, "resampler.safetensors"), params)
            manifest["resampler"] = {"tensors": n}
            print(f"resampler: {n} tensors", flush=True)
        for art in ("mean", "std"):
            p = os.path.join(to2v, f"{art}.pt")
            if os.path.exists(p):
                import torch

                arr = torch.load(p, map_location="cpu", weights_only=True)
                np.save(os.path.join(args.out, f"{art}.npy"), arr.float().numpy())
                manifest[art] = True
        pca_pt = os.path.join(to2v, "pca.pt")
        if os.path.exists(pca_pt):
            from tokensgen_tpu.convert.safetensors_io import save_safetensors

            state = C.load_pca_artifact(pca_pt)
            save_safetensors(os.path.join(args.out, "pca.safetensors"), {
                "mean_": np.asarray(state.mean, np.float32),
                "components_": np.asarray(state.components, np.float32),
            })
            manifest["pca"] = True

    if args.what in ("all", "t2to"):
        sd = _load_dir_safetensors(os.path.join(t2to, "transformer"))
        if sd:
            params = C.convert_dit(sd, DiTConfig.t2to_5b())
            n = _save_tree(os.path.join(args.out, "t2to_dit.safetensors"), params)
            manifest["t2to_dit"] = {"tensors": n}
            print(f"t2to_dit: {n} tensors", flush=True)

    if args.what in ("all", "vae"):
        sd = _load_dir_safetensors(os.path.join(base, "vae"))
        if sd:
            params = C.convert_vae(sd, VAEConfig.cogvideox())
            n = _save_tree(os.path.join(args.out, "vae.safetensors"), params)
            manifest["vae"] = {"tensors": n}
            print(f"vae: {n} tensors", flush=True)

    if args.what in ("all", "t5"):
        sd = _load_dir_safetensors(os.path.join(base, "text_encoder"))
        if sd:
            from tokensgen_tpu.models.t5 import T5Config

            params = C.convert_t5(sd, T5Config.xxl().num_layers)
            n = _save_tree(os.path.join(args.out, "t5.safetensors"), params)
            manifest["t5"] = {"tensors": n}
            print(f"t5: {n} tensors", flush=True)

    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    if not manifest:
        print("nothing converted — check --weights layout", flush=True)
    else:
        print(f"manifest: {manifest}", flush=True)


if __name__ == "__main__":
    main()

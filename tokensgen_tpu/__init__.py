"""TokensGen-TPU: a TPU-native (JAX/XLA/Pallas/pjit) long-video generation framework.

Re-implements the capabilities of TokensGen (ICCV 2025, arXiv 2507.15728):

* **To2V** — Video IP-Adapter conditioning: a Perceiver resampler condenses a video
  chunk's VAE latents into a small set of "VIP" tokens, and every DiT block carries a
  parallel VIP attention branch conditioning generation on those tokens.
* **T2To** — a second DiT that generates the condensed-token sequence for an entire
  long video directly from text, in a PCA-compressed 16-dim token space.
* **FIFO diagonal denoising** — a first-in-first-out latent queue where each frame
  sits at its own noise level, enabling arbitrarily long videos; parallelised here by
  sharding the queue-partition axis over a TPU mesh (ICI collectives) instead of the
  reference's torch.multiprocessing fan-out.

Everything under the hood is JAX: models are pure functions over parameter pytrees,
samplers are `lax.scan` loops under `jit`, attention is a Pallas flash-attention
kernel, and multi-chip execution uses `shard_map` over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

_PUBLIC = {
    "To2VPipeline": "tokensgen_tpu.pipelines.to2v",
    "To2VConfig": "tokensgen_tpu.pipelines.to2v",
    "T2ToPipeline": "tokensgen_tpu.pipelines.t2to",
    "T2ToConfig": "tokensgen_tpu.pipelines.t2to",
    "CogVideoXTransformer": "tokensgen_tpu.models.dit",
    "DiTConfig": "tokensgen_tpu.models.dit",
    "VIPConfig": "tokensgen_tpu.models.dit",
    "Resampler": "tokensgen_tpu.models.resampler",
    "ResamplerConfig": "tokensgen_tpu.models.resampler",
    "AutoencoderKLCogVideoX": "tokensgen_tpu.models.vae3d",
    "VAEConfig": "tokensgen_tpu.models.vae3d",
    "VAERunner": "tokensgen_tpu.models.vae3d",
    "VideoService": "tokensgen_tpu.serving",
    "make_mesh": "tokensgen_tpu.sharding.mesh",
    "MeshSpec": "tokensgen_tpu.sharding.mesh",
}


def __getattr__(name):  # lazy public API (keeps import light)
    if name in _PUBLIC:
        import importlib

        return getattr(importlib.import_module(_PUBLIC[name]), name)
    raise AttributeError(name)

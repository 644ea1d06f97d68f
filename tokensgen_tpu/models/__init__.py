from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig, VIPConfig  # noqa: F401
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig  # noqa: F401
from tokensgen_tpu.models.vae3d import AutoencoderKLCogVideoX, VAEConfig, VAERunner  # noqa: F401

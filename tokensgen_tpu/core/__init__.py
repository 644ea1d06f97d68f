from tokensgen_tpu.core import cfg, pca, rope, schedule  # noqa: F401

from tokensgen_tpu.train import objective, to2v  # noqa: F401

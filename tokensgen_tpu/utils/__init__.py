from tokensgen_tpu.utils.params import init_params_bf16, param_bytes, param_count  # noqa: F401

"""int8 quantized dense path (opt-in serving mode; no reference analog).

`quantize_dit_params` converts a trained bf16 tree into the QuantDense
layout; the quantized model must track the bf16 model closely (weight-only
w8a16 tighter than dynamic-activation w8a8) and halve the per-block
projection bytes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import (
    CogVideoXTransformer, DiTConfig, VIPConfig, fuse_qkv_params,
    graft_vip_params, quantize_dit_params,
)

from test_dit import _make_inputs


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)


@pytest.mark.parametrize("mode", ["w8a16", "w8a8"])
def test_quant_dit_tracks_bf16(mode):
    vc = VIPConfig(length=2 * 4 * 6, output_dim=24, num_temporal_queries=2,
                   num_height_queries=4, num_width_queries=6)
    cfg = DiTConfig.tiny(vip=vc)
    rng = np.random.default_rng(0)
    x, text, t, rope, extras = _make_inputs(cfg, rng, vip_frames=2)

    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t,
                        image_rotary_emb=rope, **extras)
    params = {"params": graft_vip_params(params["params"], cfg)}
    ref = model.apply(params, x, text, t, image_rotary_emb=rope, **extras)

    qcfg = DiTConfig.tiny(vip=vc, quant=mode)
    qmodel = CogVideoXTransformer(qcfg)
    qparams = {"params": quantize_dit_params(params["params"], qcfg)}
    out = qmodel.apply(qparams, x, text, t, image_rotary_emb=rope, **extras)

    assert out.shape == ref.shape
    assert np.isfinite(np.asarray(out)).all()
    # int8 per-channel quantization noise through a 2-layer tiny model; the
    # outputs are O(1) (AdaLN-gated residuals)
    tol = 0.05 if mode == "w8a16" else 0.12
    assert _rel_err(out, ref) < tol, _rel_err(out, ref)


def test_quant_param_layout_and_bytes():
    cfg = DiTConfig.tiny()
    rng = np.random.default_rng(1)
    x, text, t, rope, _ = _make_inputs(cfg, rng)
    model = CogVideoXTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), x, text, t,
                        image_rotary_emb=rope)

    qcfg = DiTConfig.tiny(quant="w8a16")
    qp = quantize_dit_params(params["params"], qcfg)

    blocks = qp["blocks"]["attn1"]
    assert blocks["to_q"]["kernel_q"].dtype == jnp.int8
    assert blocks["to_q"]["scale"].dtype == jnp.float32
    # scan-stacked: leading layer axis preserved
    assert blocks["to_q"]["kernel_q"].shape[0] == cfg.num_layers
    assert blocks["to_q"]["scale"].shape == (
        cfg.num_layers, cfg.inner_dim)
    # the quant layout must be applicable by the quant model directly
    qmodel = CogVideoXTransformer(qcfg)
    out = qmodel.apply({"params": qp}, x, text, t, image_rotary_emb=rope)
    assert np.isfinite(np.asarray(out)).all()

    def tree_bytes(tree, names):
        import flax
        return sum(
            v.size * v.dtype.itemsize
            for k, v in flax.traverse_util.flatten_dict(tree).items()
            if len(k) >= 2 and k[-2] in names and k[-1].startswith("kernel"))

    names = ("to_q", "to_k", "to_v", "to_out", "net_0_proj", "net_2")
    orig = tree_bytes(params["params"], names)
    quant = tree_bytes(qp, names)
    # f32-init kernels -> int8: 4x; from a bf16 tree it would be 2x
    assert quant * 3 < orig


def test_quant_after_fuse_qkv():
    cfg = DiTConfig.tiny(fuse_qkv=True)
    rng = np.random.default_rng(2)
    x, text, t, rope, _ = _make_inputs(cfg, rng)
    base = CogVideoXTransformer(DiTConfig.tiny())
    params = base.init(jax.random.PRNGKey(0), x, text, t,
                       image_rotary_emb=rope)
    fused = fuse_qkv_params(params["params"])
    ref = CogVideoXTransformer(cfg).apply(
        {"params": fused}, x, text, t, image_rotary_emb=rope)

    qcfg = DiTConfig.tiny(fuse_qkv=True, quant="w8a16")
    qp = quantize_dit_params(fused, qcfg)
    out = CogVideoXTransformer(qcfg).apply(
        {"params": qp}, x, text, t, image_rotary_emb=rope)
    assert _rel_err(out, ref) < 0.05

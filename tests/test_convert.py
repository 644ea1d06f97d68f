"""Converter tests: export -> convert roundtrips must reproduce init params exactly
(tree structure, shapes, transposition conventions), plus safetensors IO."""

import numpy as np
import jax
import jax.numpy as jnp
import flax

from tokensgen_tpu.convert import export as E
from tokensgen_tpu.convert import torch_weights as C
from tokensgen_tpu.convert.safetensors_io import load_safetensors, save_safetensors
from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig, VIPConfig
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
from tokensgen_tpu.models.t5 import T5Config, T5Encoder


def _trees_equal(a, b):
    fa = flax.traverse_util.flatten_dict(a)
    fb = flax.traverse_util.flatten_dict(b)
    assert set(fa.keys()) == set(fb.keys()), (
        set(fa.keys()) ^ set(fb.keys())
    )
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]), rtol=1e-6,
                                   err_msg=str(k))


def test_dit_roundtrip_with_vip():
    vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=4,
                   num_width_queries=6, length=2 * 4 * 6)
    cfg = DiTConfig.tiny(vip=vc)
    model = CogVideoXTransformer(cfg)
    rng = np.random.default_rng(0)
    d = cfg.attention_head_dim
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(2), np.arange(4), np.arange(8))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 16, cfg.sample_height, cfg.sample_width)),
        jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32),
        vip_hidden_states=jnp.zeros((1, 2, 24, 4, 6)),
        image_rotary_emb=rope,
        vip_image_rotary_emb=rope,
        vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(d, np.arange(2), np.arange(4), np.arange(6)),
    )["params"]
    sd = E.export_dit(params, cfg)
    back = C.convert_dit(sd, cfg)
    _trees_equal(params, back)


def test_vip_only_export():
    vc = VIPConfig(output_dim=24, num_temporal_queries=2, num_height_queries=4,
                   num_width_queries=6, length=2 * 4 * 6)
    cfg = DiTConfig.tiny(vip=vc)
    model = CogVideoXTransformer(cfg)
    d = cfg.attention_head_dim
    rope = get_3d_rotary_pos_embed_v2(d, np.arange(2), np.arange(4), np.arange(8))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 16, cfg.sample_height, cfg.sample_width)),
        jnp.zeros((1, cfg.max_text_seq_length, cfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32),
        vip_hidden_states=jnp.zeros((1, 2, 24, 4, 6)),
        image_rotary_emb=rope,
        vip_image_rotary_emb=rope,
        vip_condition_rotary_emb=get_3d_rotary_pos_embed_v2(d, np.arange(2), np.arange(4), np.arange(6)),
    )["params"]
    vip_sd = E.export_vip_only(params, cfg)
    assert all("vip_" in k for k in vip_sd)
    assert any("processor.vip_to_q" in k for k in vip_sd)
    assert any("vip_norm1" in k for k in vip_sd)
    # merging the vip overlay onto the base reproduces the full dict
    base_sd = {k: v for k, v in E.export_dit(params, cfg).items() if "vip_" not in k}
    merged = C.merge_vip_state_dict(base_sd, vip_sd)
    back = C.convert_dit(merged, cfg)
    _trees_equal(params, back)


def test_resampler_roundtrip():
    cfg = ResamplerConfig.tiny()
    model = Resampler(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 6, cfg.embedding_dim))
    )["params"]
    sd = E.export_resampler(params, cfg.depth)
    back = C.convert_resampler(sd, cfg.depth)
    _trees_equal(params, back)


def test_t5_convert_structure():
    cfg = T5Config.tiny()
    model = T5Encoder(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6), jnp.int32))["params"]
    # synthesise an HF-style state dict with the right names/shapes
    rng = np.random.default_rng(0)
    sd = {
        "shared.weight": rng.normal(size=(cfg.vocab_size, cfg.d_model)).astype(np.float32),
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
            rng.normal(size=(cfg.relative_attention_num_buckets, cfg.num_heads)).astype(np.float32),
        "encoder.final_layer_norm.weight": np.ones(cfg.d_model, np.float32),
    }
    inner = cfg.num_heads * cfg.d_kv
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        sd[f"{pre}.layer.0.layer_norm.weight"] = np.ones(cfg.d_model, np.float32)
        sd[f"{pre}.layer.1.layer_norm.weight"] = np.ones(cfg.d_model, np.float32)
        for n in ("q", "k", "v"):
            sd[f"{pre}.layer.0.SelfAttention.{n}.weight"] = rng.normal(
                size=(inner, cfg.d_model)).astype(np.float32)
        sd[f"{pre}.layer.0.SelfAttention.o.weight"] = rng.normal(
            size=(cfg.d_model, inner)).astype(np.float32)
        sd[f"{pre}.layer.1.DenseReluDense.wi_0.weight"] = rng.normal(
            size=(cfg.d_ff, cfg.d_model)).astype(np.float32)
        sd[f"{pre}.layer.1.DenseReluDense.wi_1.weight"] = rng.normal(
            size=(cfg.d_ff, cfg.d_model)).astype(np.float32)
        sd[f"{pre}.layer.1.DenseReluDense.wo.weight"] = rng.normal(
            size=(cfg.d_model, cfg.d_ff)).astype(np.float32)
    conv = C.convert_t5(sd, cfg.num_layers)
    fa = flax.traverse_util.flatten_dict(params)
    fb = flax.traverse_util.flatten_dict(conv)
    assert set(fa.keys()) == set(fb.keys())
    for k in fa:
        assert np.asarray(fa[k]).shape == np.asarray(fb[k]).shape, k
    # converted params run through the model
    out = model.apply({"params": conv}, jnp.asarray([[1, 2, 3, 4, 5, 0]]))
    assert np.isfinite(np.asarray(out)).all()


def test_safetensors_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    tensors = {
        "a": rng.normal(size=(3, 4)).astype(np.float32),
        "b/c": rng.integers(0, 10, size=(5,)).astype(np.int64),
    }
    path = str(tmp_path / "x.safetensors")
    save_safetensors(path, tensors)
    back = load_safetensors(path)
    assert set(back) == {"a", "b/c"}
    np.testing.assert_array_equal(back["a"], tensors["a"])
    np.testing.assert_array_equal(back["b/c"], tensors["b/c"])


def test_safetensors_bf16_load(tmp_path):
    """bf16 tensors (the checkpoint dtype) are upcast to f32 on load."""
    import json, struct
    arr = np.asarray([1.5, -2.25, 0.0], np.float32)
    u16 = (arr.view(np.uint32) >> 16).astype(np.uint16)
    blob = u16.tobytes()
    header = {"x": {"dtype": "BF16", "shape": [3], "data_offsets": [0, len(blob)]}}
    hjson = json.dumps(header).encode()
    path = tmp_path / "bf16.safetensors"
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        f.write(blob)
    back = load_safetensors(str(path))
    np.testing.assert_array_equal(back["x"], arr)

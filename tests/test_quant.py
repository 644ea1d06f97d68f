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


def test_quant_dit_under_queue_sharded_fifo():
    """The shipped composition: QuantDense INSIDE the shard_map rank windows,
    output merged by psum (`sampling/fifo.py:340-361`) — the queue-sharded
    w8a8 FIFO must equal the single-device w8a8 FIFO (same int8 arithmetic;
    only the merge order differs). Mirrors the 8-GPU shipped deployment
    (`infer_cogvideo_mp_fifo.py:211-213`) under the serving-default quant."""
    import dataclasses

    import jax.numpy as jnp

    from tokensgen_tpu.sharding import MeshSpec, make_mesh

    from test_pipeline_to2v import build_tiny_pipe
    from tokensgen_tpu.pipelines.to2v import To2VPipeline

    pipe = build_tiny_pipe()
    qcfg = dataclasses.replace(pipe.dit_config, quant="w8a8")
    qparams = {"params": quantize_dit_params(
        pipe.dit_params["params"], qcfg)}
    qpipe = To2VPipeline(pipe.cfg, qcfg, qparams, pipe.resampler_config,
                         pipe.resampler_params, pipe.vae, pipe.sched)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(-1, 1, size=(1, 18, 32, 48, 3)).astype(np.float32))
    text = jnp.asarray(rng.normal(size=(
        1, qcfg.max_text_seq_length, qcfg.text_embed_dim)), jnp.float32)
    neg = jnp.zeros_like(text)
    kw = dict(frames=frames, num_chunks=2, rng=jax.random.PRNGKey(3),
              decode=False)

    single = qpipe.generate(text, neg, **kw)
    mesh = make_mesh(MeshSpec(data=1, queue=2 * pipe.cfg.num_partitions))
    shard = qpipe.generate(text, neg, **kw, mesh=mesh)
    a, b = np.asarray(single["latents"]), np.asarray(shard["latents"])
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    # guard: the quant model must actually be on the int8 path
    dense = pipe.generate(text, neg, **kw)
    assert np.abs(np.asarray(dense["latents"]) - a).max() > 0


def test_quant_dense_shard_map_psum():
    """Unit form of the same composition: a QuantDense apply inside shard_map
    whose outputs are psum-merged over the mesh equals the unsharded apply."""
    from jax.sharding import PartitionSpec as P

    from tokensgen_tpu.models.layers import QuantDense
    from tokensgen_tpu.sharding import MeshSpec, make_mesh

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    # absmax per-output-channel quantization (quantize_dit_params formula)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    kq = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    mod = QuantDense(features=16, mode="w8a8", use_bias=True)
    params = {"params": {"kernel_q": kq, "scale": scale, "bias": b}}
    ref = mod.apply(params, x)

    mesh = make_mesh(MeshSpec(data=4))
    from jax import shard_map

    def fn(params, xs):
        # the FIFO merge pattern: each device's QuantDense output lands in
        # its slot of a zeros buffer; psum assembles the disjoint pieces
        y = mod.apply(params, xs)  # [1, 8, 16] local shard
        buf = jnp.zeros((4,) + y.shape[1:], y.dtype)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, y, jax.lax.axis_index("data"), axis=0)
        return jax.lax.psum(buf, "data")

    out = jax.jit(shard_map(
        fn, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
        check_vma=False))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


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

"""Composed multi-chip training throughput statement (BASELINE gate #5).

The memory side of "full-size training is multi-chip by construction" is
test-asserted byte tables (train/memory.py). This module composes the TIME
side the same way: projected v5p-8 step time / items-per-second / MFU for the
two reference training workloads, from

* the MEASURED on-chip per-layer fwd+bwd times (PERF.md, real v5e chip):
  - To2V adapter step: 387.9 ms/layer at B=1 production token shape
    (``tools/bench_train.py 8 3`` — 8 layers, 3103 ms, matching the 386.5
    per-layer micro-measurement),
  - T2To full-finetune step: 388.0 ms/layer at bs=3, 24-chunk tokens
    (``tools/bench_train_t2to.py 4 3``),
  - host data pipeline: 15.2 CPU-seconds per To2V item
    (``tools/bench_data_pipeline.py``),
* analytic per-layer FLOPs of the production shapes (same dense+attention
  itemisation as bench.py's inference model, times the training factor),
* the reference workload layouts: To2V bs 2/device x 8 x accum 9, T2To
  bs 3/device x 8 x accum 5 (`config/train/*_to2v.yaml:57-84`,
  `*_t2to.yaml:68-93`).

The v5p projection assumes the measured v5e compute utilisation carries over:
``t_v5p = t_v5e * peak_v5e / peak_v5p``. That is the honest first-order
model for a compute-bound step (the per-layer time is 94%+ MXU work at these
shapes); v5p's 3.4x HBM bandwidth only helps, so the projection is
conservative. Grad all-reduce is modelled as a ring over ICI and reported
separately — it overlaps the backward in practice.

Everything here is recomputed from the real param-tree shapes by
``tests/test_train_throughput.py``; `tools/mem_budget.py --throughput`
prints the tables for PERF.md.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

# bf16 peak TFLOP/s per chip (public spec sheets; v5e also in PERF.md's
# bench arithmetic), and an effective ICI all-reduce bandwidth per chip.
CHIP_BF16_PEAK = {"v5e": 197e12, "v5p": 459e12}
ICI_ALLREDUCE_GBPS = {"v5e": 45.0, "v5p": 90.0}  # effective ring bytes/s 1e9

# measured anchors (PERF.md; real v5e chip)
MEASURED_TO2V_MS_PER_LAYER_B1 = 387.9  # tools/bench_train.py 8 3
MEASURED_T2TO_MS_PER_LAYER_B3 = 388.0  # tools/bench_train_t2to.py 4 3
MEASURED_DATA_CPU_S_PER_ITEM = 15.2    # tools/bench_data_pipeline.py

GiB = 1024.0**3


def _layer_flops_fwd(seq: int, inner: int, s_vip: int = 0,
                     vip: bool = False) -> float:
    """Forward FLOPs of one DiT block at batch 1 (bench.py's itemisation:
    qkv+out dense, FF, joint attention; plus the VIP branch's extra qkv,
    vip-FF and cross-attention scores when grafted)."""
    ffn = 4 * inner
    per_layer = 2 * seq * (4 * inner * inner) + 2 * seq * (2 * inner * ffn)
    attn = 4 * seq * seq * inner
    if vip:
        per_layer += 2 * seq * (3 * inner * inner)  # vip qkv over joint seq
        per_layer += 2 * s_vip * (2 * inner * ffn)  # vip ff
        attn += 4 * seq * s_vip * inner + 4 * s_vip * (seq + s_vip) * inner
    return per_layer + attn


@dataclasses.dataclass
class Throughput:
    workload: str
    layout: str
    rows: Dict[str, float]

    def table(self) -> str:
        lines = [f"### {self.workload} — {self.layout}", "",
                 "| quantity | value |", "|---|---|"]
        for k, v in self.rows.items():
            lines.append(f"| {k} | {v:.3g} |")
        return "\n".join(lines)


def _trainable_param_count_to2v() -> int:
    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.models.dit import DiTConfig, VIPConfig
    from tokensgen_tpu.models.resampler import ResamplerConfig
    from tokensgen_tpu.train import to2v

    vc = VIPConfig()
    dcfg = DiTConfig.cogvideox_5b(vip=vc, remat=True)
    rcfg = ResamplerConfig()

    def build(rng):
        example = {
            "latents": jnp.zeros((1, 13, 16, 60, 90)),
            "vip_input": jnp.zeros((1, 13, 30 * 45, rcfg.embedding_dim)),
            "text_embeds": jnp.zeros(
                (1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        }
        return to2v.init_params(dcfg, rcfg, rng, example)

    params = jax.eval_shape(build, jax.random.PRNGKey(0))
    train_p, _ = to2v.partition_params(params)
    return sum(int(np.prod(x.shape)) for x in train_p.values())


def _param_count_t2to() -> int:
    import jax
    import jax.numpy as jnp

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig

    dcfg = DiTConfig.t2to_5b(remat=True)
    f = 24 * 4
    dit = CogVideoXTransformer(dcfg)
    rope = jax.eval_shape(
        lambda: get_3d_rotary_pos_embed_v2(
            dcfg.attention_head_dim, np.arange(f), np.arange(8),
            np.arange(12), dim_t=52, dim_h=6, dim_w=6))

    def build(rng):
        return dit.init(
            rng, jnp.zeros((1, f, 16, 8, 12)),
            jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
            jnp.zeros((1,), jnp.int32),
            image_rotary_emb=tuple(jnp.zeros(r.shape, r.dtype) for r in rope),
        )["params"]

    params = jax.eval_shape(build, jax.random.PRNGKey(0))
    return sum(int(np.prod(x.shape))
               for x in __import__("jax").tree_util.tree_leaves(params))


def to2v_throughput(per_device_batch: int = 2, accum: int = 9,
                    n_devices: int = 8, chip: str = "v5p",
                    host_cores: int = 224) -> Throughput:
    """To2V adapter training, reference workload bs2 x 8 x accum 9.

    Train-FLOPs factor: forward (1x) + remat recompute (1x) + dX backward
    (~1x: W^T dY through every dense) + dW backward restricted to the
    trainable vip/resampler leaves (~0.3x of the dense share) ≈ 3.3x the
    forward — reported for MFU context only; the time numbers rest on the
    measured per-layer anchor, not on this factor."""
    from tokensgen_tpu.models.dit import DiTConfig, VIPConfig

    vc = VIPConfig()
    dcfg = DiTConfig.cogvideox_5b(vip=vc)
    nf, hp, wp = 13, 30, 45
    seq = dcfg.max_text_seq_length + nf * hp * wp
    fwd = _layer_flops_fwd(seq, dcfg.inner_dim, s_vip=vc.length, vip=True)
    train_factor = 3.3
    layer_flops = fwd * train_factor * per_device_batch

    t_layer_v5e = (MEASURED_TO2V_MS_PER_LAYER_B1 / 1e3) * per_device_batch
    mfu_v5e = layer_flops / t_layer_v5e / CHIP_BF16_PEAK["v5e"]
    t_layer = t_layer_v5e * CHIP_BF16_PEAK["v5e"] / CHIP_BF16_PEAK[chip]
    micro_s = dcfg.num_layers * t_layer
    step_s = accum * micro_s

    n_train = _trainable_param_count_to2v()
    ar_bytes = n_train * 4  # f32 grads
    ar_s = 2 * (n_devices - 1) / n_devices * ar_bytes / (
        ICI_ALLREDUCE_GBPS[chip] * 1e9)

    items_per_step = per_device_batch * n_devices * accum
    items_per_s = items_per_step / (step_s + ar_s)
    data_cores = items_per_s * MEASURED_DATA_CPU_S_PER_ITEM
    return Throughput(
        "To2V adapter training",
        f"bs {per_device_batch}/device x {n_devices} {chip}, accum {accum}",
        {
            f"measured v5e ms/layer (B={per_device_batch})": t_layer_v5e * 1e3,
            "analytic train TFLOP/layer": layer_flops / 1e12,
            "implied v5e MFU": mfu_v5e,
            f"projected {chip} micro-step (s)": micro_s,
            f"projected {chip} optimizer step (s, accum {accum})": step_s,
            "grad all-reduce (s, overlappable)": ar_s,
            "items/s (global)": items_per_s,
            "host decode cores needed (15.2 cpu-s/item)": data_cores,
            "host cores available (v5e-8/v5p-8 hosts)": float(host_cores),
        })


def t2to_throughput(per_device_batch: int = 3, accum: int = 5,
                    n_devices: int = 8, chip: str = "v5p",
                    max_chunks: int = 24) -> Throughput:
    """T2To full finetune, reference workload bs3 x 8 x accum 5.
    Train-FLOPs factor 4x forward (fwd + remat recompute + full dX + dW)."""
    from tokensgen_tpu.models.dit import DiTConfig

    dcfg = DiTConfig.t2to_5b()
    f = max_chunks * 4
    seq = dcfg.max_text_seq_length + f * 8 * 12
    fwd = _layer_flops_fwd(seq, dcfg.inner_dim)
    train_factor = 4.0
    layer_flops = fwd * train_factor * per_device_batch

    t_layer_v5e = MEASURED_T2TO_MS_PER_LAYER_B3 / 1e3  # measured AT bs=3
    if per_device_batch != 3:
        t_layer_v5e = t_layer_v5e * per_device_batch / 3.0
    mfu_v5e = layer_flops / t_layer_v5e / CHIP_BF16_PEAK["v5e"]
    t_layer = t_layer_v5e * CHIP_BF16_PEAK["v5e"] / CHIP_BF16_PEAK[chip]
    micro_s = dcfg.num_layers * t_layer
    step_s = accum * micro_s

    n_params = _param_count_t2to()
    ar_bytes = n_params * 4
    ar_s = 2 * (n_devices - 1) / n_devices * ar_bytes / (
        ICI_ALLREDUCE_GBPS[chip] * 1e9)

    items_per_step = per_device_batch * n_devices * accum
    items_per_s = items_per_step / (step_s + ar_s)
    return Throughput(
        "T2To full finetune",
        f"bs {per_device_batch}/device x {n_devices} {chip}, accum {accum}",
        {
            f"measured v5e ms/layer (bs={per_device_batch})": t_layer_v5e * 1e3,
            "analytic train TFLOP/layer": layer_flops / 1e12,
            "implied v5e MFU": mfu_v5e,
            f"projected {chip} micro-step (s)": micro_s,
            f"projected {chip} optimizer step (s, accum {accum})": step_s,
            "grad all-reduce (s, overlappable)": ar_s,
            "items/s (global, precomputed-latent inputs)": items_per_s,
        })

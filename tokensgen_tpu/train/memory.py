"""Multi-chip training memory budgets — pure shape math, no hardware needed.

Computes per-device HBM bytes for the production training workloads on a given
(dp, ZeRO-1) layout, from the REAL parameter/optimizer shape trees
(`jax.eval_shape` over the actual init + `optimizer.init`) plus an analytic
activation model for the remat-per-block backward. This makes the "full-size
training is multi-chip by construction" claim a computed, test-asserted table
(tests/test_memory_budget.py) instead of an assertion.

Reference workloads being budgeted (BASELINE.md):
* To2V adapter training: bs 2/GPU x 8 GPUs x accum 9, 49-frame 720x480 chunks,
  8-bit Adam (`config/train/*_to2v.yaml:57-84`),
* T2To full finetune: bs 3/GPU, accum 5, 24-chunk token sequences, AdamW
  (`config/train/*_t2to.yaml:68-93`).

Activation model (bf16 compute):
* remat carry: `jax.checkpoint` per block inside the layer scan saves each
  block's input streams -> L x B x (S_tv + S_vip) x D bf16,
* block working set: one block's live tensors during the backward recompute
  (qkv + attention out + lse + FF in/gelu/out + AdaLN temps), modelled as
  `BLOCK_WORK_COPIES` bf16 copies of [B, S, D] — a deliberate over-estimate of
  XLA's actual liveness so fit verdicts are conservative.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import numpy as np

# HBM per chip (GiB): v5e 16, v5p 95 (per-chip HBM of the parts the BASELINE
# names). Conservative usable fraction: XLA reserves some HBM for the program
# / scratch; budget against 90%.
CHIP_HBM_GIB = {"v5e": 16.0, "v5p": 95.0}
USABLE_FRACTION = 0.90
BLOCK_WORK_COPIES = 12  # bf16 [B,S,D] copies live in one block's fwd+bwd

GiB = 1024.0**3


def _leaf_bytes(x) -> int:
    n = int(np.prod(getattr(x, "shape", ()) or (1,)))
    return n * np.dtype(x.dtype).itemsize


def _zero_sharded_bytes(tree, zero_ranks: int) -> int:
    """ZeRO-1 layout bytes per device: same per-leaf rule as
    sharding/zero.py::_leaf_spec (first dim divisible by the rank count is
    sharded; small leaves stay replicated)."""
    from jax.sharding import PartitionSpec as P

    from tokensgen_tpu.sharding.zero import _leaf_spec

    total = 0
    for x in jax.tree_util.tree_leaves(tree):
        spec = _leaf_spec(x, "data", zero_ranks)
        div = zero_ranks if spec != P() else 1
        total += _leaf_bytes(x) // div
    return total


def _tree_bytes(tree) -> int:
    return sum(_leaf_bytes(x) for x in jax.tree_util.tree_leaves(tree))


@dataclasses.dataclass
class Budget:
    workload: str
    layout: str
    rows: Dict[str, float]  # component -> GiB per device

    @property
    def total_gib(self) -> float:
        return sum(self.rows.values())

    def fits(self, chip: str) -> bool:
        return self.total_gib <= CHIP_HBM_GIB[chip] * USABLE_FRACTION

    def table(self) -> str:
        lines = [f"### {self.workload} — {self.layout}", "",
                 "| component | GiB/device |", "|---|---|"]
        for k, v in self.rows.items():
            lines.append(f"| {k} | {v:.2f} |")
        lines.append(f"| **total** | **{self.total_gib:.2f}** |")
        for chip, cap in CHIP_HBM_GIB.items():
            verdict = "FITS" if self.fits(chip) else "DOES NOT FIT"
            lines.append(
                f"| vs {chip}-8 ({cap:.0f} GiB, {USABLE_FRACTION:.0%} usable)"
                f" | {verdict} |")
        return "\n".join(lines)


def _activation_gib(num_layers: int, b: int, s_total: int, inner: int) -> Dict[str, float]:
    carry = num_layers * b * s_total * inner * 2  # bf16 remat carries
    block = BLOCK_WORK_COPIES * b * s_total * inner * 2
    return {"remat carries (bf16)": carry / GiB,
            f"block working set (~{BLOCK_WORK_COPIES} copies bf16)": block / GiB}


def to2v_budget(per_device_batch: int = 2, accum: int = 9,
                zero_ranks: int = 8) -> Budget:
    """To2V adapter training: frozen bf16 base + f32 trainable masters +
    blockwise-int8 Adam + MultiSteps f32 accumulator (trainable only),
    ZeRO-1 over `zero_ranks` data ranks. Reference: bs 2/GPU x 8, accum 9."""
    import jax.numpy as jnp

    from tokensgen_tpu.models.dit import DiTConfig, VIPConfig
    from tokensgen_tpu.models.resampler import ResamplerConfig
    from tokensgen_tpu.train import to2v

    vc = VIPConfig()
    dcfg = DiTConfig.cogvideox_5b(vip=vc, remat=True)
    rcfg = ResamplerConfig()
    nf, h_lat, w_lat = 13, 60, 90

    def build(rng):
        example = {
            "latents": jnp.zeros((1, nf, 16, h_lat, w_lat)),
            "vip_input": jnp.zeros(
                (1, nf, (h_lat // 2) * (w_lat // 2), rcfg.embedding_dim)),
            "text_embeds": jnp.zeros(
                (1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        }
        params = to2v.init_params(dcfg, rcfg, rng, example)
        return to2v.cast_frozen_bf16(params)

    params = jax.eval_shape(build, jax.random.PRNGKey(0))
    tcfg = to2v.To2VTrainConfig(use_8bit_adam=True)
    optimizer = to2v.make_optimizer(params, tcfg, accum_steps=accum)
    opt_state = jax.eval_shape(optimizer.init, params)

    train_p, frozen_p = to2v.partition_params(params)
    s_tv = dcfg.max_text_seq_length + nf * (h_lat // 2) * (w_lat // 2)
    s_vip = vc.length
    rows = {
        "frozen base params (bf16, replicated)": _tree_bytes(frozen_p) / GiB,
        "trainable masters (f32, replicated)": _tree_bytes(train_p) / GiB,
        f"optimizer state incl. accum (int8 Adam, ZeRO-1/{zero_ranks})":
            _zero_sharded_bytes(opt_state, zero_ranks) / GiB,
        "gradients (f32 trainable, transient)": _tree_bytes(train_p) / GiB,
    }
    rows.update(_activation_gib(dcfg.num_layers, per_device_batch,
                                s_tv + s_vip, dcfg.inner_dim))
    return Budget("To2V adapter training",
                  f"bs {per_device_batch}/device, dp{zero_ranks} + ZeRO-1, "
                  f"accum {accum}", rows)


def t2to_budget(per_device_batch: int = 3, accum: int = 5,
                zero_ranks: int = 8, max_chunks: int = 24) -> Budget:
    """T2To full finetune: every param trains (f32 masters + f32 AdamW
    moments + f32 accumulator), ZeRO-1 over the data ranks. Reference: bs 3,
    accum 5, 24-chunk sequences."""
    import jax.numpy as jnp

    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
    from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
    from tokensgen_tpu.train import t2to

    dcfg = DiTConfig.t2to_5b(remat=True)
    f = max_chunks * 4
    dit = CogVideoXTransformer(dcfg)
    rope = jax.eval_shape(
        lambda: get_3d_rotary_pos_embed_v2(
            dcfg.attention_head_dim, np.arange(f), np.arange(8), np.arange(12),
            dim_t=52, dim_h=6, dim_w=6))

    def build(rng):
        return dit.init(
            rng, jnp.zeros((1, f, 16, 8, 12)),
            jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
            jnp.zeros((1,), jnp.int32),
            image_rotary_emb=tuple(jnp.zeros(r.shape, r.dtype) for r in rope),
        )["params"]

    params = jax.eval_shape(build, jax.random.PRNGKey(0))
    tcfg = t2to.T2ToTrainConfig()
    optimizer = t2to.make_optimizer(tcfg, accum_steps=accum)
    opt_state = jax.eval_shape(optimizer.init, params)

    s_tv = dcfg.max_text_seq_length + f * 8 * 12
    rows = {
        "params (f32 masters, replicated)": _tree_bytes(params) / GiB,
        "bf16 compute copy (per-block transient)":
            _tree_bytes(params) / 2 / dcfg.num_layers / GiB,
        f"optimizer state incl. accum (f32 AdamW, ZeRO-1/{zero_ranks})":
            _zero_sharded_bytes(opt_state, zero_ranks) / GiB,
        "gradients (f32, transient)": _tree_bytes(params) / GiB,
    }
    rows.update(_activation_gib(dcfg.num_layers, per_device_batch, s_tv,
                                dcfg.inner_dim))
    return Budget("T2To full finetune",
                  f"bs {per_device_batch}/device, dp{zero_ranks} + ZeRO-1, "
                  f"accum {accum}", rows)

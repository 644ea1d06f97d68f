"""To2V adapter training: data-parallel pjit train step.

Reference semantics (`/root/reference/train_cogvideo_to2v.py`):
* freeze the whole DiT except the ``vip_*`` parameters; train those + the full
  Resampler (`:1455-1481`),
* two timestep regimes mixed by ``diff_timesteps_ratio`` — per-frame FIFO ramps vs
  uniform (optionally rank-stratified) (`:1773-1818`),
* v-pred x0-space weighted loss (`:1995-2004`), grad clip 1.0, AdamW, constant lr
  2e-4, bf16 compute with fp32 master weights.

TPU design: one jitted SPMD step over the mesh ``data`` axis — params replicated,
batch sharded, gradient psum inserted by XLA (replaces accelerate/DDP/NCCL).
Frozen-base masking is an `optax.multi_transform` over a label pytree, so the
optimizer holds state only for trainable leaves.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax
import jax
import jax.numpy as jnp
import optax

from tokensgen_tpu.core import schedule as S
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
from tokensgen_tpu.models.resampler import Resampler, ResamplerConfig
from tokensgen_tpu.train import objective


@dataclasses.dataclass(frozen=True)
class To2VTrainConfig:
    use_8bit_adam: bool = True  # reference default (`use_8bit_adam: true`)
    optimizer: str = "adamw"  # adam | adamw | prodigy (`get_optimizer`)
    learning_rate: float = 2e-4
    lr_scheduler: str = "constant"  # diffusers get_scheduler names
    lr_warmup_steps: int = 0
    lr_num_cycles: int = 1  # cosine_with_restarts (`--lr_num_cycles`)
    lr_power: float = 1.0  # polynomial (`--lr_power`)
    max_train_steps: int = 1000  # decay horizon for non-constant schedules
    weight_decay: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.95
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    diff_timesteps_ratio: float = 0.4
    inference_timesteps: int = 52
    num_processes: int = 1  # data-parallel ranks for stratified t sampling
    # LoRA finetuning (config-reachable, like the reference's peft path
    # `train_cogvideo_to2v.py:1326-1338`: rank/alpha over to_{q,k,v,out},
    # default-off). rank > 0 adds a "lora" subtree trained ALONGSIDE the
    # vip/resampler adapters; the base DiT stays frozen and the LoRA delta is
    # merged functionally inside the loss (train/lora.py).
    lora_rank: int = 0
    lora_alpha: float = 64.0
    lora_targets: tuple = ("to_q", "to_k", "to_v", "to_out")


def trainable_labels(params: Dict) -> Dict:
    """Label pytree: 'train' for vip_* DiT params and all resampler params,
    'freeze' otherwise (mirrors `train_cogvideo_to2v.py:1455-1481`)."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for key in flat:
        path = "/".join(str(k) for k in key)
        if (path.startswith("resampler/") or path.startswith("lora/")
                or "vip_" in path):
            labels[key] = "train"
        else:
            labels[key] = "freeze"
    return flax.traverse_util.unflatten_dict(labels)


def cast_frozen_bf16(params: Dict) -> Dict:
    """bf16 storage for frozen leaves; f32 masters stay only where the
    optimizer updates. Halves the frozen params' HBM AND removes XLA's
    f32->bf16 convert temps of every big frozen weight (a bf16-compute model
    over f32 params materialises a full bf16 copy per weight per step —
    measured as the largest allocations of the 5b train step's OOM dump).
    The reference does the same: frozen transformer in bf16 under accelerate
    mixed precision, fp32 optimizer masters (`train_cogvideo_to2v.py:1323`)."""
    labels = flax.traverse_util.flatten_dict(trainable_labels(params))
    flat = flax.traverse_util.flatten_dict(params)
    out = {
        k: (v.astype(jnp.bfloat16)
            if labels[k] == "freeze" and v.dtype == jnp.float32 else v)
        for k, v in flat.items()
    }
    return flax.traverse_util.unflatten_dict(out)


def partition_params(params: Dict):
    """Split the param tree into (trainable, frozen) flat dicts keyed by
    flattened path, per `trainable_labels`. Structural only — safe on traced
    values."""
    labels = flax.traverse_util.flatten_dict(trainable_labels(params))
    flat = flax.traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items() if labels[k] == "train"}
    frozen = {k: v for k, v in flat.items() if labels[k] == "freeze"}
    return train, frozen


def make_optimizer(params: Dict, cfg: To2VTrainConfig,
                   accum_steps: int = 1) -> optax.GradientTransformation:
    from tokensgen_tpu.train import optim

    lr = optim.lr_schedule(cfg.lr_scheduler, cfg.learning_rate,
                           cfg.lr_warmup_steps, cfg.max_train_steps,
                           num_cycles=cfg.lr_num_cycles, power=cfg.lr_power)
    inner = optim.base_optimizer(
        cfg.optimizer, lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
        eps=cfg.adam_eps, weight_decay=cfg.weight_decay,
        use_8bit=cfg.use_8bit_adam)
    adamw = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), inner)
    if accum_steps > 1:
        # MultiSteps INSIDE the train branch: the f32 accumulation buffer then
        # exists only for the ~1% trainable leaves — wrapped around the whole
        # multi_transform it would hold a dead f32 copy of the frozen 5.5B
        # base (~22 GB before ZeRO sharding)
        adamw = optax.MultiSteps(adamw, every_k_schedule=accum_steps)
    return optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()}, trainable_labels(params)
    )


def make_train_step(
    dit_config: DiTConfig,
    resampler_config: ResamplerConfig,
    sched: S.DiffusionSchedule,
    cfg: To2VTrainConfig,
    optimizer: optax.GradientTransformation,
):
    """Returns `train_step(params, opt_state, batch, rng) -> (params, opt_state,
    metrics)`, a pure function to be jitted / pjitted by the caller.

    ``params`` = {"dit": ..., "resampler": ...}.
    ``batch``:
      latents        [B, F, C, H, W]  clean VAE latents of the training window
      vip_input      [B, Fv, N, E]    per-frame patch tokens feeding the resampler
      text_embeds    [B, T, text_dim]
      image_rotary_emb / vip_image_rotary_emb / vip_condition_rotary_emb: rope pairs
      process_index  scalar int (optional; for stratified timestep sampling)
    """
    dit = CogVideoXTransformer(dit_config)
    resampler = Resampler(resampler_config)

    def loss_fn(params, batch, rng):
        r_t, r_noise, r_mix = jax.random.split(rng, 3)
        latents = batch["latents"]
        b, f = latents.shape[0], latents.shape[1]

        dit_params = params["dit"]
        if "lora" in params:
            from tokensgen_tpu.train.lora import merge_lora

            # functional merge: grads flow to the (trainable) a/b factors,
            # the frozen base kernels enter as constants
            dit_params = merge_lora(dit_params, params["lora"],
                                    cfg.lora_rank, cfg.lora_alpha)

        # stratified sampling: the reference stratifies by DDP rank
        # (`:1797-1818`); in one SPMD program the equivalent strata are the
        # batch positions (which map onto the data-parallel devices)
        proc_idx = batch.get("process_index")
        if proc_idx is None and cfg.num_processes > 1:
            proc_idx = jnp.arange(b) % cfg.num_processes
        t_uniform = objective.sample_uniform_timesteps(
            r_t, b, sched.config.num_train_timesteps,
            proc_idx, cfg.num_processes,
        )
        t_ramp = objective.sample_fifo_ramp_timesteps(
            r_t, b, f, sched.config.num_train_timesteps, cfg.inference_timesteps
        )
        use_ramp = jax.random.uniform(r_mix, ()) < cfg.diff_timesteps_ratio
        timesteps = jnp.where(use_ramp, t_ramp, jnp.broadcast_to(t_uniform[:, None], (b, f)))

        noise = jax.random.normal(r_noise, latents.shape, dtype=latents.dtype)
        noisy = S.add_noise(sched, latents, noise, timesteps)

        # VIP tokens must be produced INSIDE the loss so the (trainable)
        # resampler receives gradients. Two input forms:
        #   vip_input          [B, F, N, E]      single-chunk tokens
        #   vip_input_chunks   [B, C, F, N, E]   per-chunk tokens + window select
        #                                        indices vip_emb_sel [B, n_vip]
        rs_img = batch.get("resampler_image_rotary_emb")
        rs_smp = batch.get("resampler_sampling_rotary_emb")
        if batch.get("vip_input_chunks") is not None:
            chunks = batch["vip_input_chunks"]
            toks = [
                resampler.apply({"params": params["resampler"]}, chunks[:, c],
                                rs_img, rs_smp)
                for c in range(chunks.shape[1])
            ]
            vip_all = jnp.concatenate(toks, axis=1)
            sel = batch["vip_emb_sel"][:, :, None, None, None]
            vip_tokens = jnp.take_along_axis(vip_all, sel, axis=1)
        else:
            vip_tokens = resampler.apply(
                {"params": params["resampler"]}, batch["vip_input"], rs_img, rs_smp
            )
        model_out = dit.apply(
            {"params": dit_params},
            noisy,
            batch["text_embeds"],
            timesteps,
            vip_hidden_states=vip_tokens,
            image_rotary_emb=batch.get("image_rotary_emb"),
            vip_image_rotary_emb=batch.get("vip_image_rotary_emb"),
            vip_condition_rotary_emb=batch.get("vip_condition_rotary_emb"),
        ).astype(jnp.float32)
        loss = objective.x0_weighted_loss(
            sched, model_out, noisy.astype(jnp.float32), latents.astype(jnp.float32),
            timesteps,
        )
        return loss

    def train_step(params, opt_state, batch, rng):
        # Differentiate ONLY the trainable subtree (vip_* + resampler, ~1% of
        # the 7B tree). Frozen weights enter the trace as constants, so JAX
        # never emits their x^T@dy weight-grad matmuls or grad buffers —
        # without this, the step computes+stores ~14 GB of dead dW for the
        # frozen base (the round-2 single-chip train OOM) and burns ~2x the
        # necessary backward matmul FLOPs. Mirrors the reference, where only
        # requires_grad params get .grad (`train_cogvideo_to2v.py:1455-1481`).
        train_p, frozen_p = partition_params(params)

        def loss_on_trainable(tp):
            full = flax.traverse_util.unflatten_dict({**frozen_p, **tp})
            return loss_fn(full, batch, rng)

        loss, grads_t = jax.value_and_grad(loss_on_trainable)(train_p)
        gnorm = optax.global_norm(grads_t)
        # multi_transform wants the full tree shape; frozen slots get constant
        # zeros, which the `set_to_zero` branch ignores and XLA's algebraic
        # simplifier elides from `apply_updates` (p + 0 -> p, donated alias)
        zeros = {k: jnp.zeros(v.shape, v.dtype) for k, v in frozen_p.items()}
        grads = flax.traverse_util.unflatten_dict({**zeros, **grads_t})
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def init_params(
    dit_config: DiTConfig,
    resampler_config: ResamplerConfig,
    rng: jax.Array,
    example_batch: Dict[str, Any],
    lora_rank: int = 0,
    lora_targets=("to_q", "to_k", "to_v", "to_out"),
) -> Dict[str, Any]:
    from tokensgen_tpu.models.dit import graft_vip_params

    dit = CogVideoXTransformer(dit_config)
    resampler = Resampler(resampler_config)
    r1, r2, r3 = jax.random.split(rng, 3)
    rs_params = resampler.init(r1, example_batch["vip_input"])["params"]
    vip_tokens = resampler.apply({"params": rs_params}, example_batch["vip_input"])
    b, f = example_batch["latents"].shape[:2]
    dit_vars = dit.init(
        r2,
        example_batch["latents"],
        example_batch["text_embeds"],
        jnp.zeros((b, f), jnp.int32),
        vip_hidden_states=vip_tokens,
        image_rotary_emb=example_batch.get("image_rotary_emb"),
        vip_image_rotary_emb=example_batch.get("vip_image_rotary_emb"),
        vip_condition_rotary_emb=example_batch.get("vip_condition_rotary_emb"),
    )
    dit_params = graft_vip_params(dit_vars["params"], dit_config)
    out = {"dit": dit_params, "resampler": rs_params}
    if lora_rank > 0:
        from tokensgen_tpu.train.lora import init_lora

        out["lora"] = init_lora(dit_params, r3, rank=lora_rank,
                                targets=tuple(lora_targets))
    return out

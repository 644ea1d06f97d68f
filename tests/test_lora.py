"""LoRA adapter tests on the tiny DiT."""

import numpy as np
import jax
import jax.numpy as jnp

from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2
from tokensgen_tpu.models.dit import CogVideoXTransformer, DiTConfig
from tokensgen_tpu.train.lora import init_lora, lora_param_count, merge_lora


def _setup():
    cfg = DiTConfig.tiny()
    model = CogVideoXTransformer(cfg)
    rng = np.random.default_rng(0)
    f = 2
    hp, wp = cfg.sample_height // 2, cfg.sample_width // 2
    x = jnp.asarray(rng.normal(size=(1, f, 16, cfg.sample_height, cfg.sample_width)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(1, cfg.max_text_seq_length, cfg.text_embed_dim)), jnp.float32)
    t = jnp.asarray([500])
    rope = get_3d_rotary_pos_embed_v2(cfg.attention_head_dim, np.arange(f), np.arange(hp), np.arange(wp))
    params = model.init(jax.random.PRNGKey(0), x, text, t, image_rotary_emb=rope)["params"]
    return cfg, model, params, (x, text, t, rope)


def test_zero_init_is_identity():
    cfg, model, params, (x, text, t, rope) = _setup()
    lora = init_lora(params, jax.random.PRNGKey(1), rank=4)
    assert lora_param_count(lora) > 0
    merged = merge_lora(params, lora, rank=4)
    out0 = model.apply({"params": params}, x, text, t, image_rotary_emb=rope)
    out1 = model.apply({"params": merged}, x, text, t, image_rotary_emb=rope)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=1e-6)


def test_targets_scan_stacked():
    cfg, model, params, _ = _setup()
    lora = init_lora(params, jax.random.PRNGKey(1), rank=4)
    # scan-stacked attn kernels get per-layer adapters
    key = "blocks/attn1/to_q/kernel"
    assert key in lora
    assert lora[key]["a"].shape == (cfg.num_layers, cfg.inner_dim, 4)
    assert lora[key]["b"].shape == (cfg.num_layers, 4, cfg.inner_dim)


def test_to2v_train_step_with_lora():
    """Config-reachable LoRA (`lora_rank` key): a To2V train step updates the
    lora factors alongside vip/resampler, leaves the frozen base untouched,
    and the merged model differs from the base after stepping."""
    import flax
    import optax

    from tokensgen_tpu.core import schedule as S
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2 as rope_v2
    from tokensgen_tpu.models.dit import VIPConfig
    from tokensgen_tpu.models.resampler import ResamplerConfig
    from tokensgen_tpu.train import to2v

    vc = VIPConfig(length=2 * 2 * 3, output_dim=24, num_temporal_queries=2,
                   num_height_queries=2, num_width_queries=3)
    dcfg = DiTConfig.tiny(vip=vc)
    rcfg = ResamplerConfig.tiny(num_temporal_queries=2, num_height_queries=2,
                                num_width_queries=3, output_dim=24)
    f = 3
    hp, wp = dcfg.sample_height // 2, dcfg.sample_width // 2
    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.normal(size=(2, f, 16, dcfg.sample_height,
                                                dcfg.sample_width)), jnp.float32),
        "vip_input": jnp.asarray(rng.normal(size=(2, 3, 4, rcfg.embedding_dim)),
                                 jnp.float32),
        "text_embeds": jnp.asarray(rng.normal(size=(
            2, dcfg.max_text_seq_length, dcfg.text_embed_dim)), jnp.float32),
        "image_rotary_emb": rope_v2(dcfg.attention_head_dim, np.arange(f),
                                    np.arange(hp), np.arange(wp)),
        "vip_image_rotary_emb": rope_v2(dcfg.attention_head_dim,
                                        np.arange(f) + 1000, np.arange(hp),
                                        np.arange(wp)),
        "vip_condition_rotary_emb": rope_v2(dcfg.attention_head_dim,
                                            np.arange(2) + 1000, np.arange(2),
                                            np.arange(3)),
    }
    sched = S.make_schedule(S.ScheduleConfig())
    tcfg = to2v.To2VTrainConfig(lora_rank=4, lora_alpha=8.0)
    params = to2v.init_params(dcfg, rcfg, jax.random.PRNGKey(0), batch,
                              lora_rank=4)
    assert "lora" in params
    labels = flax.traverse_util.flatten_dict(to2v.trainable_labels(params))
    assert all(v == "train" for k, v in labels.items() if k[0] == "lora")

    optimizer = to2v.make_optimizer(params, tcfg)
    opt_state = optimizer.init(params)
    step = jax.jit(to2v.make_train_step(dcfg, rcfg, sched, tcfg, optimizer))
    p0 = jax.device_get(params)
    new_params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # lora B moved; frozen base kernel identical
    b0 = np.asarray(p0["lora"]["blocks/attn1/to_q/kernel"]["b"])
    b1 = np.asarray(new_params["lora"]["blocks/attn1/to_q/kernel"]["b"])
    assert np.abs(b1 - b0).max() > 0
    k0 = np.asarray(p0["dit"]["blocks"]["attn1"]["to_q"]["kernel"])
    k1 = np.asarray(new_params["dit"]["blocks"]["attn1"]["to_q"]["kernel"])
    np.testing.assert_array_equal(k0, k1)
    # merged weights now differ from the base
    merged = merge_lora(jax.device_get(new_params)["dit"],
                        jax.device_get(new_params)["lora"], 4, 8.0)
    m = np.asarray(merged["blocks"]["attn1"]["to_q"]["kernel"])
    assert np.abs(m - k1).max() > 0


def test_t2to_train_step_with_lora():
    """T2To LoRA mode: only the lora factors move; the 5b-clone base is
    frozen."""
    from tokensgen_tpu.core import schedule as S
    from tokensgen_tpu.core.rope import get_3d_rotary_pos_embed_v2 as rope_v2
    from tokensgen_tpu.train import t2to as t2to_train

    dcfg = DiTConfig.tiny(patch_size=1, sample_height=8, sample_width=12,
                          attention_head_dim=64, num_attention_heads=1)
    f = 8
    rng = np.random.default_rng(1)
    model = CogVideoXTransformer(dcfg)
    rope = rope_v2(dcfg.attention_head_dim, np.arange(f), np.arange(8),
                   np.arange(12), dim_t=52, dim_h=6, dim_w=6)
    base = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, f, 16, 8, 12)),
        jnp.zeros((1, dcfg.max_text_seq_length, dcfg.text_embed_dim)),
        jnp.zeros((1,), jnp.int32), image_rotary_emb=rope)["params"]
    lora = init_lora(base, jax.random.PRNGKey(2), rank=4)
    params = {"dit": base, "lora": lora}

    sched = S.make_schedule(S.ScheduleConfig(beta_schedule="vip_1"))
    tcfg = t2to_train.T2ToTrainConfig(lora_rank=4, lora_alpha=8.0)
    optimizer = t2to_train.make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step = jax.jit(t2to_train.make_train_step(dcfg, sched, tcfg, optimizer))
    batch = {
        "latents": jnp.asarray(rng.normal(size=(2, f, 16, 8, 12)), jnp.float32),
        "text_embeds": jnp.asarray(rng.normal(size=(
            2, dcfg.max_text_seq_length, dcfg.text_embed_dim)) * 0.02,
            jnp.float32),
        "valid_frames": jnp.asarray([8, 4]),
    }
    p0 = jax.device_get(params)
    new_params, opt_state, metrics = step(params, opt_state, batch,
                                          jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    b0 = np.asarray(p0["lora"]["blocks/attn1/to_q/kernel"]["b"])
    b1 = np.asarray(new_params["lora"]["blocks/attn1/to_q/kernel"]["b"])
    assert np.abs(b1 - b0).max() > 0
    k0 = np.asarray(p0["dit"]["blocks"]["attn1"]["to_q"]["kernel"])
    k1 = np.asarray(new_params["dit"]["blocks"]["attn1"]["to_q"]["kernel"])
    np.testing.assert_array_equal(k0, k1)


def test_gradients_flow_and_change_output():
    cfg, model, params, (x, text, t, rope) = _setup()
    lora = init_lora(params, jax.random.PRNGKey(1), rank=4)

    def loss_fn(lora_p):
        merged = merge_lora(params, lora_p, rank=4)
        out = model.apply({"params": merged}, x, text, t, image_rotary_emb=rope)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss_fn)(lora)
    gb = np.asarray(grads["blocks/attn1/to_q/kernel"]["b"])
    assert np.abs(gb).max() > 0  # grads reach B even though B==0

    # perturb B -> output changes
    lora2 = jax.tree_util.tree_map(lambda v: v + 0.1, lora)
    out0 = model.apply({"params": merge_lora(params, lora, 4)}, x, text, t, image_rotary_emb=rope)
    out1 = model.apply({"params": merge_lora(params, lora2, 4)}, x, text, t, image_rotary_emb=rope)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))

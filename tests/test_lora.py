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

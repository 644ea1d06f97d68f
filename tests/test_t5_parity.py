"""Flax T5 encoder vs transformers' torch T5EncoderModel as numerical oracle
(the reference encodes prompts with T5-XXL via transformers,
`train_cogvideo_to2v.py` compute_prompt_embeddings). Random tiny config, real
state dict through `convert_t5` — the same recipe as the DiT/VAE oracle tests."""

import numpy as np
import torch

import jax.numpy as jnp


def _tiny_hf_t5():
    from transformers import T5Config as HFT5Config
    from transformers.models.t5.modeling_t5 import T5EncoderModel

    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False)
    return T5EncoderModel(hf_cfg).eval()


def test_t5_encoder_parity():
    from tokensgen_tpu.convert.torch_weights import convert_t5
    from tokensgen_tpu.models.t5 import T5Config, T5Encoder

    tm = _tiny_hf_t5()
    cfg = T5Config.tiny()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = convert_t5(sd, cfg.num_layers)

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 120, size=(2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[0, 9:] = 0  # padded tail on sample 0
    mask[1, 7:] = 0

    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state

    got = T5Encoder(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask).astype(bool))
    assert got.shape == tuple(ref.shape)
    # padded positions may legitimately differ (masked out downstream);
    # compare the attended positions exactly
    ref_np, got_np = ref.numpy(), np.asarray(got)
    for b in range(2):
        n = int(mask[b].sum())
        # 1e-3 absolute on O(1-2) outputs: torch(oneDNN) vs XLA accumulation
        # order; observed max |d| ~4.5e-4
        np.testing.assert_allclose(got_np[b, :n], ref_np[b, :n], atol=1e-3)

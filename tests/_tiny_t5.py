"""Fabricate a tiny HF-layout T5 checkpoint dir (weights + fast tokenizer) for
tests that drive the REAL text-encoder loading path offline — no downloaded
artifacts. The reference loads tokenizer+T5 the same way
(`/root/reference/infer_cogvideo_mp_fifo.py:123-134`)."""

import json
import os

import numpy as np


def write_tiny_tokenizer(d: str, max_length: int = 8) -> None:
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    for i, w in enumerate(
            ["a", "tiny", "smoke", "test", "prompt", "gen", "the", "red",
             "vehicle", "snow", "mountain", "road"]):
        vocab[w] = 3 + i
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)])
    tok.enable_padding(pad_id=0, pad_token="<pad>")
    os.makedirs(d, exist_ok=True)
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "pad_token": "<pad>", "eos_token": "</s>",
                   "unk_token": "<unk>", "model_max_length": max_length}, f)


def write_tiny_t5_dir(d: str, d_model: int = 24, with_tokenizer: bool = True,
                      seed: int = 0) -> None:
    """HF torch T5EncoderModel state dict (random tiny config, vocab 128,
    d_model configurable to match the DiT's text_embed_dim) saved as
    model.safetensors in `d`, plus (optionally) the fast tokenizer."""
    import torch
    from transformers import T5Config as HFT5Config
    from transformers.models.t5.modeling_t5 import T5EncoderModel

    from tokensgen_tpu.convert.safetensors_io import save_safetensors

    torch.manual_seed(seed)
    hf_cfg = HFT5Config(
        vocab_size=128, d_model=d_model, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False)
    model = T5EncoderModel(hf_cfg).eval()
    sd = {k: v.numpy().astype(np.float32) for k, v in model.state_dict().items()}
    os.makedirs(d, exist_ok=True)
    save_safetensors(os.path.join(d, "model.safetensors"), sd)
    if with_tokenizer:
        write_tiny_tokenizer(d)

"""Text conditioning interface for the pipelines/trainers.

The reference encodes prompts with transformers' T5-XXL + tokenizer at 226 tokens
(`/root/reference/train_cogvideo_to2v.py` `compute_prompt_embeddings`). Here the
interface is pluggable:

* `T5TextEncoder` — our flax T5 (see `models/t5.py`) + an HF tokenizer, for when
  converted weights + a sentencepiece model are on disk,
* `HashTextEncoder` — deterministic pseudo-embeddings keyed on the prompt string
  (weights-free environments: smoke tests, precompute dry-runs),
* `CachedTextEncoder` — wraps either with an embedding cache (prompt encoding is
  a one-time cost per prompt; SURVEY §7.3).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


class HashTextEncoder:
    def __init__(self, max_length: int = 226, embed_dim: int = 4096,
                 scale: float = 0.02):
        self.max_length = max_length
        self.embed_dim = embed_dim
        self.scale = scale

    def __call__(self, prompts: List[str]) -> jnp.ndarray:
        out = np.zeros((len(prompts), self.max_length, self.embed_dim), np.float32)
        for i, p in enumerate(prompts):
            seed = int.from_bytes(hashlib.sha256(p.encode()).digest()[:4], "little")
            out[i] = np.random.default_rng(seed).normal(
                size=(self.max_length, self.embed_dim)) * self.scale
        return jnp.asarray(out)


def _config_from_param_tree(tree) -> "T5Config":
    """Infer a `T5Config` from a converted flax param tree's shapes — converted
    checkpoints carry no config.json, and the shapes pin down every field."""
    from tokensgen_tpu.models.t5 import T5Config
    import jax.numpy as _jnp

    vocab, d_model = tree["embed"]["embedding"].shape
    num_buckets, num_heads = tree["relative_attention_bias"].shape
    d_kv = tree["block_0"]["attn"]["q"]["kernel"].shape[1] // num_heads
    d_ff = tree["block_0"]["wi_0"]["kernel"].shape[1]
    num_layers = sum(1 for k in tree if k.startswith("block_"))
    return T5Config(
        vocab_size=vocab, d_model=d_model, d_kv=d_kv, d_ff=d_ff,
        num_layers=num_layers, num_heads=num_heads,
        relative_attention_num_buckets=num_buckets,
        dtype=_jnp.bfloat16 if d_model >= 1024 else _jnp.float32,
    )


def _load_tokenizer(model_dir: str, tokenizer_dir: Optional[str] = None):
    """HF tokenizer from `tokenizer_dir`, `model_dir` itself, or the sibling
    `../tokenizer` dir (the CogVideoX-5b layout keeps `text_encoder/` weights
    next to a separate `tokenizer/`)."""
    import os

    from transformers import AutoTokenizer

    candidates = [tokenizer_dir] if tokenizer_dir else [
        model_dir, os.path.join(os.path.dirname(model_dir.rstrip("/")), "tokenizer")]
    last = None
    for cand in candidates:
        if not cand or not os.path.isdir(cand):
            continue
        try:
            return AutoTokenizer.from_pretrained(cand)
        except Exception as e:  # missing/corrupt tokenizer files
            last = e
    raise FileNotFoundError(
        f"no loadable tokenizer in {candidates}: {last}")


class T5TextEncoder:
    """Tokenise (HF tokenizer) + encode (our flax T5)."""

    def __init__(self, t5_config, t5_params, tokenizer, max_length: int = 226):
        from tokensgen_tpu.models.t5 import T5Encoder

        self.model = T5Encoder(t5_config)
        self.params = t5_params
        self.tokenizer = tokenizer
        self.max_length = max_length

    @classmethod
    def from_pretrained(cls, model_dir: str, max_length: int = 226,
                        tokenizer_dir: Optional[str] = None):
        """Load HF torch T5 weights + tokenizer from a local dir
        (reference: tokenizer+T5 load, `infer_cogvideo_mp_fifo.py:123-134`)."""
        import os

        from tokensgen_tpu.convert.safetensors_io import load_safetensors
        from tokensgen_tpu.convert.torch_weights import convert_t5

        sd = {}
        for name in sorted(os.listdir(model_dir)):
            if name.endswith(".safetensors"):
                sd.update(load_safetensors(os.path.join(model_dir, name)))
        if not sd:
            raise FileNotFoundError(f"no .safetensors weights in {model_dir}")
        num_layers = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("encoder.block."))
        params = convert_t5(sd, num_layers)
        cfg = _config_from_param_tree(params)
        tokenizer = _load_tokenizer(model_dir, tokenizer_dir)
        return cls(cfg, {"params": params}, tokenizer, max_length)

    @classmethod
    def from_converted(cls, t5_path: str, tokenizer_dir: str,
                       max_length: int = 226):
        """Load a `convert_weights.py` export (`<dir>/t5.safetensors`, our param
        layout) + an HF tokenizer dir."""
        from tokensgen_tpu.convert.safetensors_io import load_param_tree

        tree = load_param_tree(t5_path)
        cfg = _config_from_param_tree(tree)
        tokenizer = _load_tokenizer(tokenizer_dir)
        return cls(cfg, {"params": tree}, tokenizer, max_length)

    def __call__(self, prompts: List[str]) -> jnp.ndarray:
        enc = self.tokenizer(
            prompts, padding="max_length", max_length=self.max_length,
            truncation=True, return_tensors="np",
        )
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"]).astype(bool)
        return self.model.apply(self.params, ids, mask)


class CachedTextEncoder:
    def __init__(self, inner):
        self.inner = inner
        self._cache: Dict[str, np.ndarray] = {}

    def __call__(self, prompts: List[str]) -> jnp.ndarray:
        missing = [p for p in prompts if p not in self._cache]
        if missing:
            embs = np.asarray(self.inner(missing))
            for p, e in zip(missing, embs):
                self._cache[p] = e
        return jnp.asarray(np.stack([self._cache[p] for p in prompts]))


def make_text_encoder(model_dir: Optional[str], max_length: int = 226,
                      embed_dim: int = 4096, allow_hash_fallback: bool = False,
                      converted_path: Optional[str] = None,
                      tokenizer_dir: Optional[str] = None):
    """T5 when a checkpoint is given, hash encoder otherwise — cached.

    ``converted_path`` (a `convert_weights.py` t5.safetensors export) takes
    precedence over ``model_dir`` (an HF torch T5 dir). A configured checkpoint
    that fails to load (missing/corrupt weights or tokenizer) RAISES rather
    than silently degrading to hash pseudo-embeddings — a typo'd weights path
    must not "succeed" with garbage conditioning. Smoke tests opt into the
    degradation with ``allow_hash_fallback=True``.
    """
    import os

    if converted_path or model_dir:
        try:
            if converted_path:
                if not os.path.isfile(converted_path):
                    raise FileNotFoundError(
                        f"converted t5 weights not found: {converted_path}")
                enc = T5TextEncoder.from_converted(
                    converted_path, tokenizer_dir, max_length)
            else:
                if not os.path.isdir(model_dir):
                    raise FileNotFoundError(
                        f"text encoder dir not found: {model_dir}")
                enc = T5TextEncoder.from_pretrained(
                    model_dir, max_length, tokenizer_dir)
            return CachedTextEncoder(enc)
        except Exception as e:  # missing tokenizer/weights
            if not allow_hash_fallback:
                raise RuntimeError(
                    f"failed to load T5 text encoder from "
                    f"{converted_path or model_dir!r}: {e}. Pass "
                    "allow_hash_fallback=True (or leave the path unset) to "
                    "run with deterministic hash pseudo-embeddings."
                ) from e
            print(f"T5 load failed ({e}); falling back to hash text encoder")
    return CachedTextEncoder(HashTextEncoder(max_length, embed_dim))

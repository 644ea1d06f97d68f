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


class T5TextEncoder:
    """Tokenise (HF T5Tokenizer) + encode (our flax T5)."""

    def __init__(self, t5_config, t5_params, tokenizer, max_length: int = 226):
        from tokensgen_tpu.models.t5 import T5Encoder

        self.model = T5Encoder(t5_config)
        self.params = t5_params
        self.tokenizer = tokenizer
        self.max_length = max_length

    @classmethod
    def from_pretrained(cls, model_dir: str, max_length: int = 226):
        """Load HF torch T5 weights + sentencepiece tokenizer from a local dir."""
        import os

        from transformers import T5Tokenizer

        from tokensgen_tpu.convert.safetensors_io import load_safetensors
        from tokensgen_tpu.convert.torch_weights import convert_t5
        from tokensgen_tpu.models.t5 import T5Config

        sd = {}
        for name in sorted(os.listdir(model_dir)):
            if name.endswith(".safetensors"):
                sd.update(load_safetensors(os.path.join(model_dir, name)))
        cfg = T5Config.xxl()
        params = convert_t5(sd, cfg.num_layers)
        tokenizer = T5Tokenizer.from_pretrained(model_dir)
        return cls(cfg, {"params": params}, tokenizer, max_length)

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
                      embed_dim: int = 4096, allow_hash_fallback: bool = False):
    """T5 when a checkpoint dir is given, hash encoder otherwise — cached.

    A configured ``model_dir`` that fails to load (missing/corrupt weights or
    tokenizer) RAISES rather than silently degrading to hash pseudo-embeddings —
    a typo'd weights path must not "succeed" with garbage conditioning. Smoke
    tests opt into the degradation with ``allow_hash_fallback=True``.
    """
    import os

    if model_dir:
        try:
            if not os.path.isdir(model_dir):
                raise FileNotFoundError(f"text encoder dir not found: {model_dir}")
            return CachedTextEncoder(T5TextEncoder.from_pretrained(model_dir, max_length))
        except Exception as e:  # missing tokenizer/weights
            if not allow_hash_fallback:
                raise RuntimeError(
                    f"failed to load T5 text encoder from {model_dir!r}: {e}. "
                    "Pass allow_hash_fallback=True (or leave model_dir unset) to "
                    "run with deterministic hash pseudo-embeddings."
                ) from e
            print(f"T5 load failed ({e}); falling back to hash text encoder")
    return CachedTextEncoder(HashTextEncoder(max_length, embed_dim))

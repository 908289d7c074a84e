"""Text towers for the CLIP family (reference uses them via open_clip / PE:
clip_generator.py:160-199).

Configurable: causal CLIP encoder (pool at EOT/argmax token) or
bidirectional SigLIP-style encoder (pool = last token or MAP head).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import layers as L

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    context_length: int = 32
    width: int = 1024
    depth: int = 24
    n_heads: int = 16
    mlp_ratio: float = 4.0
    embed_dim: int = 1024
    causal: bool = True
    pool: str = "argmax"      # argmax (CLIP EOT) | last | mean
    act: str = "gelu"         # gelu | quick_gelu (DFN '-qg' cards)
    dtype: Any = jnp.float32


def init_text(key, cfg: TextConfig) -> Params:
    ks = jax.random.split(key, cfg.depth + 4)
    return {
        "tok_embed": jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.width)) * 0.02,
        "pos": jax.random.normal(
            ks[1], (cfg.context_length, cfg.width)) * 0.01,
        "blocks": [L.init_block(ks[2 + i], cfg.width, cfg.n_heads,
                                cfg.mlp_ratio) for i in range(cfg.depth)],
        "ln_final": L.init_layer_norm(cfg.width),
        "proj": jax.random.normal(
            ks[-1], (cfg.width, cfg.embed_dim)) * cfg.width ** -0.5,
    }


def encode_text(params: Params, cfg: TextConfig, tokens: Array,
                attn_impl: str = "auto") -> Array:
    """tokens (B, context_length) int32 -> (B, embed_dim), unnormalized."""
    x = params["tok_embed"][tokens].astype(cfg.dtype)
    x = x + params["pos"].astype(x.dtype)
    for blk in params["blocks"]:
        x = L.transformer_block(blk, x, cfg.n_heads, causal=cfg.causal,
                                attn_impl=attn_impl, act=cfg.act)
    x = L.layer_norm(params["ln_final"], x)
    if cfg.pool == "argmax":
        idx = jnp.argmax(tokens, axis=-1)           # EOT has the highest id
        pooled = x[jnp.arange(x.shape[0]), idx]
    elif cfg.pool == "last":
        pooled = x[:, -1]
    else:
        pooled = jnp.mean(x, axis=1)
    out = pooled @ params["proj"].astype(pooled.dtype)
    if "proj_bias" in params:  # open_clip SigLIP: Linear text_projection
        out = out + params["proj_bias"].astype(out.dtype)
    return out

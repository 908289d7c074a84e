"""Prompt encoder: point prompts -> sparse embeddings, plus the dense
no-mask embedding (SAM/SAM2 structure: random-fourier positional encoding,
learned positive/negative/not-a-point embeddings)."""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]


def init_prompt_encoder(key, d_model: int = 256) -> Params:
    ks = jax.random.split(key, 3)
    return {
        # PositionEmbeddingRandom gaussian matrix (2, d/2), scale=1
        "pe_gaussian": jax.random.normal(ks[0], (2, d_model // 2)),
        # 0: negative point, 1: positive point, 2/3: box corners
        "point_embeds": jax.random.normal(ks[1], (4, d_model)) * 0.02,
        "not_a_point": jax.random.normal(ks[2], (d_model,)) * 0.02,
        "no_mask": jnp.zeros((d_model,)),
    }


def pe_encode(params: Params, coords01: Array) -> Array:
    """Fourier-feature encoding of [0,1] coords (..., 2) -> (..., d_model)."""
    x = (2.0 * coords01 - 1.0) @ params["pe_gaussian"]
    x = 2.0 * jnp.pi * x
    return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)


def pe_grid(params: Params, h: int, w: int) -> Array:
    """Dense positional encoding over an (h, w) grid -> (h, w, d_model)."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return pe_encode(params, jnp.stack([gx, gy], axis=-1))


def encode_points(params: Params, points01: Array, labels: Array) -> Array:
    """points01 (B, N, 2) in [0,1] (x, y); labels (B, N): 1 positive,
    0 negative, -1 padding -> sparse embeddings (B, N+1, d) including the
    appended padding point (SAM pads with a not-a-point entry when no box
    prompt is present)."""
    B, N, _ = points01.shape
    d = params["point_embeds"].shape[-1]
    pad_pt = jnp.zeros((B, 1, 2), points01.dtype)
    pad_lab = -jnp.ones((B, 1), labels.dtype)
    pts = jnp.concatenate([points01, pad_pt], axis=1)
    labs = jnp.concatenate([labels, pad_lab], axis=1)
    pe = pe_encode(params, pts)
    type_embed = jnp.where((labs == 1)[..., None],
                           params["point_embeds"][1],
                           params["point_embeds"][0])
    emb = jnp.where((labs == -1)[..., None],
                    params["not_a_point"][None, None, :],
                    pe + type_embed)
    return emb

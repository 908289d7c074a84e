"""FPN neck: project Hiera's multi-scale features to the decoder width and
fuse top-down (SAM2 FpnNeck structure: per-level 1x1 convs, nearest-neighbor
top-down addition on the lower-resolution levels, sine position encodings on
the image-embedding level)."""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]


def init_neck(key, channel_list: Tuple[int, ...], d_model: int = 256) -> Params:
    ks = jax.random.split(key, len(channel_list))
    return {"convs": [
        {"w": jax.random.normal(k, (1, 1, c, d_model)) * (c ** -0.5),
         "b": jnp.zeros((d_model,))}
        for k, c in zip(ks, channel_list)]}


def neck_forward(params: Params, feats: List[Array],
                 top_down_levels: Tuple[int, ...] = (2, 3)) -> List[Array]:
    """feats: trunk outputs highest-res first [(B,H,W,C)...]. Returns
    same-order 256-d maps with top-down fusion applied to the levels in
    ``top_down_levels`` (indices counted from the LOWEST resolution, matching
    the published config fpn_top_down_levels=[2,3] meaning the two
    highest-res levels receive coarser context)."""
    n = len(feats)
    lateral = []
    for f, conv in zip(feats, params["convs"]):
        out = jax.lax.conv_general_dilated(
            f, conv["w"].astype(f.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(f.dtype)
        lateral.append(out + conv["b"].astype(f.dtype))

    # top-down pass: from lowest res (last) to highest (first)
    outs: List[Array] = [None] * n
    prev = None
    for i in range(n - 1, -1, -1):
        level_from_low = (n - 1) - i
        x = lateral[i]
        if prev is not None and level_from_low in top_down_levels:
            up = jax.image.resize(prev, x.shape, "nearest")
            x = x + up
        outs[i] = x
        prev = x
    return outs


def sine_pos_encoding(h: int, w: int, dim: int, temperature: float = 10000.0
                      ) -> Array:
    """Standard 2D sine position encoding (H, W, dim)."""
    half = dim // 2
    quarter = half // 2
    y = jnp.arange(h, dtype=jnp.float32)[:, None, None] + 1.0
    x = jnp.arange(w, dtype=jnp.float32)[None, :, None] + 1.0
    dim_t = temperature ** (2 * (jnp.arange(quarter) // 1) / half)
    py = y / dim_t
    px = x / dim_t
    pe_y = jnp.concatenate([jnp.sin(py), jnp.cos(py)], axis=-1)
    pe_y = jnp.broadcast_to(pe_y, (h, w, half))
    pe_x = jnp.concatenate([jnp.sin(px), jnp.cos(px)], axis=-1)
    pe_x = jnp.broadcast_to(pe_x, (h, w, half))
    return jnp.concatenate([pe_y, pe_x], axis=-1)

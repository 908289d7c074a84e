"""Vision transformer family covering the CLIP / SigLIP / Perception-Encoder
image towers the reference uses (clip_utils.py:51-112).

One configurable architecture:
  - patchify conv (patch_size, width)
  - optional class token, optional learned abs pos-embed (bilinear
    interpolation when the eval grid differs from train), optional RoPE-2D
  - pre-LN transformer stack (Pallas attention)
  - pooling: "cls" | "mean" | "attn" (probe-based attention pooling, the
    PE/SigLIP head) and optional projection to the shared embed dim

forward_features() exposes the normalized token grid TextRegion consumes
(textregion.py:141-143); encode() gives the pooled/projected embedding.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers as L

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    n_heads: int = 16
    mlp_ratio: float = 4.0
    embed_dim: int = 1024           # output projection dim
    use_cls_token: bool = True
    use_abs_pos: bool = True
    use_rope2d: bool = False
    pool: str = "attn"              # cls | mean | attn
    layer_scale: Optional[float] = None
    ln_pre: bool = False
    act: str = "gelu"               # gelu | quick_gelu (DFN '-qg' cards)
    dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_tokens(self) -> int:
        return self.grid * self.grid + (1 if self.use_cls_token else 0)


def init_vit(key, cfg: ViTConfig) -> Params:
    ks = jax.random.split(key, cfg.depth + 8)
    p: Params = {
        "patch": {"w": jax.random.normal(
            ks[0], (cfg.patch_size, cfg.patch_size, 3, cfg.width)) * 0.02,
            "b": jnp.zeros((cfg.width,))},
        "blocks": [L.init_block(ks[1 + i], cfg.width, cfg.n_heads,
                                cfg.mlp_ratio, cfg.layer_scale)
                   for i in range(cfg.depth)],
        "ln_post": L.init_layer_norm(cfg.width),
        "proj": jax.random.normal(ks[-1], (cfg.width, cfg.embed_dim)) *
        cfg.width ** -0.5,
    }
    if cfg.ln_pre:
        p["ln_pre"] = L.init_layer_norm(cfg.width)
    if cfg.use_cls_token:
        p["cls"] = jax.random.normal(ks[-2], (cfg.width,)) * 0.02
    if cfg.use_abs_pos:
        p["pos"] = jax.random.normal(
            ks[-3], (cfg.n_tokens, cfg.width)) * 0.02
    if cfg.pool == "attn":
        p["attn_pool"] = init_attn_pool(ks[-4], cfg.width, cfg.n_heads)
    return p


def init_attn_pool(key, width: int, n_heads: int) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "probe": jax.random.normal(ks[0], (1, width)) * 0.02,
        "ln": L.init_layer_norm(width),
        "q": L.init_linear(ks[1], width, width),
        "k": L.init_linear(ks[2], width, width),
        "v": L.init_linear(ks[3], width, width),
        "out": L.init_linear(ks[4], width, width),
    }


def _interp_pos_embed(pos: Array, n_prefix: int, grid: int, new_grid: int
                      ) -> Array:
    if grid == new_grid:
        return pos
    prefix, grid_pos = pos[:n_prefix], pos[n_prefix:]
    grid_pos = grid_pos.reshape(grid, grid, -1)
    grid_pos = jax.image.resize(grid_pos, (new_grid, new_grid,
                                           grid_pos.shape[-1]), "bilinear")
    return jnp.concatenate([prefix, grid_pos.reshape(new_grid * new_grid, -1)])


def patchify(p: Params, imgs: Array, patch: int) -> Array:
    """imgs (B, H, W, 3) -> (B, L, width) via conv with stride=patch."""
    w = p["w"].astype(imgs.dtype)
    out = jax.lax.conv_general_dilated(
        imgs, w, window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    out = out + p["b"]
    B, gh, gw, width = out.shape
    return out.reshape(B, gh * gw, width).astype(imgs.dtype)


def forward_features(params: Params, cfg: ViTConfig, imgs: Array,
                     norm: bool = True, attn_impl: str = "auto") -> Array:
    """imgs (B, H, W, 3) float in model input scale -> tokens
    (B, n_tokens, width); ln_post applied when norm=True (the TextRegion
    entry point, textregion.py:142)."""
    x = patchify(params["patch"], imgs.astype(cfg.dtype), cfg.patch_size)
    B, Lp, W = x.shape
    grid = int(round(Lp ** 0.5))
    n_prefix = 1 if cfg.use_cls_token else 0
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (B, 1, W))
        x = jnp.concatenate([cls, x], axis=1)
    if cfg.use_abs_pos:
        pos = _interp_pos_embed(params["pos"], n_prefix, cfg.grid, grid)
        x = x + pos.astype(x.dtype)
    if cfg.ln_pre:
        x = L.layer_norm(params["ln_pre"], x)
    rope = None
    if cfg.use_rope2d:
        hd = cfg.width // cfg.n_heads
        cos, sin = L.rope2d_freqs(grid, grid, hd, n_prefix=n_prefix)
        rope = (cos, sin)

    if _use_fused_blocks(attn_impl, params):
        # whole-block Pallas path (ops/fused_block): 2 kernels per block
        # instead of ~15 XLA ops; tokens pad to a lane-aligned Lp and the
        # padded keys are masked inside the kernel
        from ..ops.fused_block import fused_transformer_block

        Lr = x.shape[1]
        Lp = -(-Lr // 128) * 128
        if Lp != Lr:
            x = jnp.concatenate(
                [x, jnp.zeros((B, Lp - Lr, W), x.dtype)], axis=1)
            if rope is not None:
                pad = jnp.zeros((Lp - Lr, rope[0].shape[-1]),
                                rope[0].dtype)
                rope = (jnp.concatenate([rope[0], pad]),
                        jnp.concatenate([rope[1], pad]))
        for blk in params["blocks"]:
            x = fused_transformer_block(blk, x, cfg.n_heads, rope=rope,
                                        act=cfg.act, l_real=Lr)
        x = x[:, :Lr]
    else:
        # pre-pad the token stream ONCE for the whole tower when the
        # packed-RoPE kernel will run: padded rows stay row-local through
        # LN/matmuls/residual (finite, never read), padded KEYS are masked
        # per layer via n_valid, and the pad is sliced off at the end --
        # deleting the per-layer qkv pads
        n_valid = None
        if rope is not None and attn_impl in ("auto", "fused"):
            from ..ops.attention import use_rope_packed

            Lr = x.shape[1]
            hd = cfg.width // cfg.n_heads
            if Lr % 8 and use_rope_packed(B * cfg.n_heads, Lr, hd,
                                          cfg.n_heads, x.dtype.itemsize):
                padn = (-Lr) % 8
                x = jnp.concatenate(
                    [x, jnp.zeros((B, padn, W), x.dtype)], axis=1)
                pad_t = jnp.zeros((padn, rope[0].shape[-1]), rope[0].dtype)
                rope = (jnp.concatenate([rope[0], pad_t]),
                        jnp.concatenate([rope[1], pad_t]))
                n_valid = Lr
        for blk in params["blocks"]:
            x = L.transformer_block(blk, x, cfg.n_heads, rope=rope,
                                    attn_impl=attn_impl, act=cfg.act,
                                    n_valid=n_valid)
        if n_valid is not None:
            x = x[:, :n_valid]
    if norm:
        x = L.layer_norm(params["ln_post"], x)
    return x


def _use_fused_blocks(attn_impl: str, params: Params) -> bool:
    """Dispatch to the whole-block Pallas kernels: explicit
    attn_impl='fused_block', or OVO_FUSED_BLOCK=1 on a real TPU under
    'auto'. LayerScale blocks fall back (kernel doesn't carry ls1/ls2)."""
    import os

    if params["blocks"] and params["blocks"][0].get("ls1") is not None:
        return False
    if attn_impl == "fused_block":
        return True
    return (attn_impl == "auto"
            and os.environ.get("OVO_FUSED_BLOCK") == "1"
            and jax.devices()[0].platform == "tpu")


def attn_pool(p: Params, x: Array, n_heads: int,
              key_mask: Optional[Array] = None) -> Array:
    """Probe attention pooling over tokens x (B, L, D) -> (B, D)."""
    from ..ops.masked_pool import masked_single_query_attention

    B, Lt, D = x.shape
    hd = D // n_heads
    xq = jnp.broadcast_to(p["probe"].astype(x.dtype), (B, 1, D))
    q = L.linear(p["q"], xq)
    kin = L.layer_norm(p["ln"], x) if p.get("ln") is not None else x
    k = L.linear(p["k"], kin)
    v = L.linear(p["v"], x)
    qh = q.reshape(B, n_heads, hd)
    kh = k.reshape(B, Lt, n_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Lt, n_heads, hd).transpose(0, 2, 1, 3)
    if key_mask is None:
        key_mask = jnp.ones((B, Lt), bool)
    outs = []
    # batch over B via vmap-free reshape: treat B as the mask axis with
    # per-item tokens -- here tokens differ per item, so use the xla path
    logits = jnp.einsum("bhd,bhld->bhl", qh, kh,
                        preferred_element_type=jnp.float32) * hd ** -0.5
    logits = jnp.where(key_mask[:, None, :], logits, -1e30)
    wts = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    o = jnp.einsum("bhl,bhld->bhd", wts, vh,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    del outs
    o = L.linear(p["out"], o.reshape(B, D))
    if p.get("mlp") is not None:
        # SigLIP MAP head (timm AttentionPoolLatent): residual MLP after
        # the pooled attention; PE's probe head has none
        o = o + L.mlp(p["mlp"], L.layer_norm(p["ln2"], o))
    return o


def encode(params: Params, cfg: ViTConfig, imgs: Array,
           attn_impl: str = "auto", project: bool = True) -> Array:
    """Pooled image embedding (B, embed_dim) -- CLIP encode_image."""
    x = forward_features(params, cfg, imgs, norm=True, attn_impl=attn_impl)
    if cfg.pool == "attn":
        pooled = attn_pool(params["attn_pool"], x, cfg.n_heads)
    elif cfg.pool == "cls":
        pooled = x[:, 0]
    else:
        start = 1 if cfg.use_cls_token else 0
        pooled = jnp.mean(x[:, start:], axis=1)
    if project:
        pooled = pooled @ params["proj"].astype(pooled.dtype)
    return pooled

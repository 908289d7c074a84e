"""ViT-det image encoder (the SAM1 trunk).

Structure mirrors the published SAM image encoder (selected by the
reference via segment_utils.load_sam when ``sam_version: ""``,
segment_utils.py:275-288: vit_b / vit_h cards through
``sam_model_registry``): 16x16/stride-16 patch conv; absolute positional
embedding; plain pre-norm ViT blocks with 14x14 windowed attention except
designated global blocks; decomposed relative positional attention bias;
a two-conv LayerNorm2d neck to the 256-d SAM embedding space.

Implemented as pure functions over a param tree. Attention runs on the XLA
path: the relative-position bias is query-DEPENDENT (two einsum terms per
block), which no fixed-bias kernel covers; the SAM1 tier is a parity
surface, not the default perf path (the bench pipeline runs SAM2 hiera_l).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .. import layers as L

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTDetConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_blocks: Tuple[int, ...] = (2, 5, 8, 11)
    window_size: int = 14
    patch: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    pretrain_grid: int = 64          # pos_embed spatial size (1024/16)


VITDET_CONFIGS = {
    "vit_b": ViTDetConfig(),
    "vit_l": ViTDetConfig(embed_dim=1024, depth=24, num_heads=16,
                          global_blocks=(5, 11, 17, 23)),
    "vit_h": ViTDetConfig(embed_dim=1280, depth=32, num_heads=16,
                          global_blocks=(7, 15, 23, 31)),
    # tiny structural-test config; window 6 over a 16-token grid exercises
    # the pad path (16 -> 18)
    "vit_test": ViTDetConfig(embed_dim=32, depth=3, num_heads=2,
                             global_blocks=(2,), window_size=6,
                             pretrain_grid=16),
}


def init_vitdet(key, cfg: ViTDetConfig) -> Params:
    ks = jax.random.split(key, cfg.depth + 4)
    dh = cfg.embed_dim // cfg.num_heads
    blocks = []
    for i in range(cfg.depth):
        kb = jax.random.split(ks[i], 6)
        ws = 0 if i in cfg.global_blocks else cfg.window_size
        span = ws if ws else cfg.pretrain_grid
        d = cfg.embed_dim
        blocks.append({
            "norm1": L.init_layer_norm(d),
            "attn": {"qkv": L.init_linear(kb[0], d, 3 * d),
                     "proj": L.init_linear(kb[1], d, d),
                     "rel_pos_h": jax.random.normal(
                         kb[2], (2 * span - 1, dh)) * 0.02,
                     "rel_pos_w": jax.random.normal(
                         kb[3], (2 * span - 1, dh)) * 0.02},
            "norm2": L.init_layer_norm(d),
            "mlp": {"fc": L.init_linear(kb[4], d, int(d * cfg.mlp_ratio)),
                    "proj": L.init_linear(kb[5], int(d * cfg.mlp_ratio), d)},
        })
    g = cfg.pretrain_grid
    return {
        "patch": {"w": jax.random.normal(
            ks[-1], (cfg.patch, cfg.patch, 3, cfg.embed_dim)) * 0.02,
            "b": jnp.zeros((cfg.embed_dim,))},
        "pos_embed": jax.random.normal(ks[-2], (g, g, cfg.embed_dim)) * 0.02,
        "blocks": blocks,
        "neck": {
            "conv1": {"w": jax.random.normal(
                ks[-3], (1, 1, cfg.embed_dim, cfg.out_chans)) * 0.02},
            "ln1": L.init_layer_norm(cfg.out_chans),
            "conv2": {"w": jax.random.normal(
                ks[-4], (3, 3, cfg.out_chans, cfg.out_chans)) * 0.02},
            "ln2": L.init_layer_norm(cfg.out_chans),
        },
    }


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _window_partition(x: Array, ws: int) -> Tuple[Array, Tuple[int, int]]:
    """(B, H, W, C) -> (B*nW, ws, ws, C) with zero padding (official SAM
    image_encoder window_partition: pads bottom/right, pad tokens attend
    like real ones and are dropped at unpartition)."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp)


def _window_unpartition(xw: Array, ws: int, pad_hw: Tuple[int, int],
                        hw: Tuple[int, int], B: int) -> Array:
    Hp, Wp = pad_hw
    C = xw.shape[-1]
    x = xw.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :hw[0], :hw[1]]


def _rel_pos_table(rel_pos: Array, size: int) -> Array:
    """(L, dh) stored table -> (size, size, dh) lookup R[q, k] for equal
    q/k extents: index q - k + size - 1 into a (2*size-1)-row table,
    linearly interpolated first if the stored length differs (official
    get_rel_pos, F.interpolate linear)."""
    need = 2 * size - 1
    if rel_pos.shape[0] != need:
        from ...ops.resize import _interp_matrix

        m = jnp.asarray(_interp_matrix(rel_pos.shape[0], need, "linear"))
        rel_pos = m.T.astype(rel_pos.dtype) @ rel_pos
    idx = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + size - 1
    return rel_pos[idx]


def _attention(p: Params, x: Array, heads: int) -> Array:
    """Rel-pos ViT attention over a spatial token map x (B, H, W, C) with
    H == W span (window or full grid). The decomposed relative-position
    bias (official add_decomposed_rel_pos) is query-dependent:
      attn[b,(qh,qw),(kh,kw)] += q[b,qh,qw,:] . Rh[qh,kh,:]
                               + q[b,qh,qw,:] . Rw[qw,kw,:]
    """
    B, H, W, C = x.shape
    dh = C // heads
    qkv = L.linear(p["qkv"], x.reshape(B, H * W, C)).reshape(
        B, H * W, 3, heads, dh)
    # fold heads into batch (official: qkv.reshape(3, B*heads, N, dh))
    q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(B * heads, H * W, dh)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(B * heads, H * W, dh)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(B * heads, H * W, dh)

    scale = dh ** -0.5
    attn = jnp.einsum("bqd,bkd->bqk", q * scale, k,
                      preferred_element_type=jnp.float32)

    rh = _rel_pos_table(p["rel_pos_h"], H).astype(q.dtype)   # (H, H, dh)
    rw = _rel_pos_table(p["rel_pos_w"], W).astype(q.dtype)   # (W, W, dh)
    qs = q.reshape(B * heads, H, W, dh)
    bias_h = jnp.einsum("bhwd,hkd->bhwk", qs, rh,
                        preferred_element_type=jnp.float32)
    bias_w = jnp.einsum("bhwd,wkd->bhwk", qs, rw,
                        preferred_element_type=jnp.float32)
    attn = (attn.reshape(B * heads, H, W, H, W)
            + bias_h[:, :, :, :, None] + bias_w[:, :, :, None, :])
    attn = jax.nn.softmax(attn.reshape(B * heads, H * W, H * W), axis=-1)
    o = jnp.einsum("bqk,bkd->bqd", attn.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.reshape(B, heads, H * W, dh).transpose(0, 2, 1, 3).reshape(
        B, H, W, C)
    return L.linear(p["proj"], o)


def _conv(p: Params, x: Array, stride: int, padding) -> Array:
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def vitdet_forward(params: Params, cfg: ViTDetConfig, imgs: Array) -> Array:
    """imgs (B, S, S, 3) normalized -> (B, S/16, S/16, out_chans) SAM
    embedding (patch conv + pos embed + blocks + LayerNorm2d neck)."""
    from ...ops.patchify import patch_embed_nonoverlap

    # stride==kernel patch conv is a pure reshape + matmul (PERF.md 6z)
    x = patch_embed_nonoverlap(imgs, params["patch"]["w"].astype(imgs.dtype),
                               params["patch"].get("b"))
    B, H, W, C = x.shape

    pos = params["pos_embed"]
    if pos.shape[:2] != (H, W):
        from ...ops.resize import resize_channels_last

        pos = resize_channels_last(pos, (H, W), kind="cubic")
    x = x + pos.astype(x.dtype)

    for i, blk in enumerate(params["blocks"]):
        ws = 0 if i in cfg.global_blocks else cfg.window_size
        shortcut = x
        xn = L.layer_norm(blk["norm1"], x)
        if ws:
            xw, pad_hw = _window_partition(xn, ws)
            aw = _attention(blk["attn"], xw, cfg.num_heads)
            att = _window_unpartition(aw, ws, pad_hw, (H, W), B)
        else:
            att = _attention(blk["attn"], xn, cfg.num_heads)
        x = shortcut + att
        x = x + L.mlp(blk["mlp"], L.layer_norm(blk["norm2"], x))

    n = params["neck"]
    # LayerNorm2d: per-pixel channel normalization, eps 1e-6, no spatial mean
    x = _conv(n["conv1"], x, 1, "VALID")
    x = L.layer_norm(n["ln1"], x, eps=1e-6)
    x = _conv(n["conv2"], x, 1, [(1, 1), (1, 1)])
    x = L.layer_norm(n["ln2"], x, eps=1e-6)
    return x

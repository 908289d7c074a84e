"""Hiera hierarchical image encoder (the SAM2 trunk).

Structure mirrors the published SAM2 Hiera design (selected by the reference
via segment_utils.load_sam, segment_utils.py:288-302): 7x7/stride-4 patch
conv; four stages with dim/head doubling and 2x2 query pooling at stage
transitions; windowed attention everywhere except designated global blocks;
absolute background pos-embed (interpolated) plus a tiled window pos-embed.

Window schedule: a stage-transition block keeps the PREVIOUS stage's window
size (its queries pool 2x inside each window, so the output windows land on
the new stage's grid) -- this is the only arithmetically consistent reading
of the published window_spec and matches the official checkpoints' layout.

Implemented as pure functions over a param tree; global blocks dispatch to
the Pallas flash-attention kernel, local blocks run batched window
attention. Multi-scale outputs (one per stage end) feed the FPN neck.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import layers as L

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class HieraConfig:
    embed_dim: int = 144
    num_heads: int = 2
    stages: Tuple[int, ...] = (2, 6, 36, 4)
    global_att_blocks: Tuple[int, ...] = (23, 33, 43)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    window_pos_size: int = 7          # background pos embed spatial size
    q_stride: int = 2
    dim_mul: float = 2.0
    head_mul: float = 2.0
    mlp_ratio: float = 4.0

    @property
    def depth(self) -> int:
        return sum(self.stages)

    @property
    def stage_ends(self) -> Tuple[int, ...]:
        ends, total = [], 0
        for s in self.stages:
            total += s
            ends.append(total - 1)
        return tuple(ends)

    def block_layout(self):
        """Per block: (dim_in, dim_out, heads_out, window_size, do_pool)."""
        layout = []
        dim, heads = self.embed_dim, self.num_heads
        stage = 0  # 0-based current stage BEFORE any transition at block i
        for i in range(self.depth):
            ws = self.window_spec[stage]
            do_pool = (i - 1) in self.stage_ends[:-1]
            dim_out, heads_out = dim, heads
            if do_pool:
                dim_out = int(dim * self.dim_mul)
                heads_out = int(heads * self.head_mul)
                stage += 1  # subsequent blocks use the new stage's window
            if i in self.global_att_blocks:
                ws = 0
            layout.append((dim, dim_out, heads_out, ws, do_pool))
            dim, heads = dim_out, heads_out
        return layout


HIERA_CONFIGS = {
    "hiera_t": HieraConfig(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
                           global_att_blocks=(5, 7, 9)),
    "hiera_s": HieraConfig(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
                           global_att_blocks=(7, 10, 13)),
    "hiera_b+": HieraConfig(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
                            global_att_blocks=(12, 16, 20)),
    "hiera_l": HieraConfig(),
    # tiny structural-test config
    "hiera_test": HieraConfig(embed_dim=32, num_heads=2, stages=(1, 1, 2, 1),
                              global_att_blocks=(3,),
                              window_spec=(8, 4, 4, 2), window_pos_size=4),
}


def init_hiera(key, cfg: HieraConfig) -> Params:
    layout = cfg.block_layout()
    ks = jax.random.split(key, cfg.depth + 4)
    blocks = []
    for i, (din, dout, heads, ws, do_pool) in enumerate(layout):
        kb = jax.random.split(ks[i], 5)
        blk = {
            "norm1": L.init_layer_norm(din),
            "attn": {"qkv": L.init_linear(kb[0], din, 3 * dout),
                     "proj": L.init_linear(kb[1], dout, dout)},
            "norm2": L.init_layer_norm(dout),
            "mlp": {"fc": L.init_linear(kb[2], dout, int(dout * cfg.mlp_ratio)),
                    "proj": L.init_linear(kb[3], int(dout * cfg.mlp_ratio),
                                          dout)},
        }
        if din != dout:
            blk["proj"] = L.init_linear(kb[4], din, dout)
        blocks.append(blk)
    return {
        "patch": {"w": jax.random.normal(ks[-1], (7, 7, 3, cfg.embed_dim))
                  * 0.02, "b": jnp.zeros((cfg.embed_dim,))},
        "pos_embed": jax.random.normal(
            ks[-2], (cfg.window_pos_size, cfg.window_pos_size,
                     cfg.embed_dim)) * 0.02,
        "pos_embed_window": jax.random.normal(
            ks[-3], (cfg.window_spec[0], cfg.window_spec[0],
                     cfg.embed_dim)) * 0.02,
        "blocks": blocks,
    }


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _window_partition(x: Array, ws: int) -> Tuple[Array, Tuple[int, int]]:
    """(B, H, W, C) -> (B*nW, ws, ws, C) with zero padding."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def _pad_mask(B: int, Hc: int, Wc: int, ws: int) -> Array:
    """1.0 over real tokens / 0.0 over window padding, in blocked layout
    (B*nW, ws, ws, 1). Input-independent, so XLA constant-folds it."""
    m = jnp.ones((B, Hc, Wc, 1), jnp.float32)
    return _window_partition(m, ws)[0]


def _window_unpartition(xw: Array, ws: int, n_wh: int, n_ww: int,
                        out_hw: Tuple[int, int], B: int) -> Array:
    C = xw.shape[-1]
    x = xw.reshape(B, n_wh, n_ww, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, n_wh * ws, n_ww * ws, C)
    return x[:, :out_hw[0], :out_hw[1]]


def _max_pool2x(x: Array, stride: int) -> Array:
    """torch MaxPool2d(kernel=stride, stride=stride) on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, stride, stride, 1),
        (1, stride, stride, 1), "VALID")


def _mh_attention(p: Params, x: Array, heads: int, dout: int,
                  q_pool: Optional[int]) -> Array:
    """MultiScaleAttention over spatial token maps x (B, H, W, Cin):
    qkv -> optional 2x2 maxpool of q -> attention -> proj.
    Returns (B, H', W', dout)."""
    from ...ops.attention import dot_product_attention

    B, H, W, _ = x.shape
    qkv = L.linear(p["qkv"], x.reshape(B, H * W, -1)).reshape(
        B, H * W, 3, dout)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    Hq, Wq = H, W
    if q_pool:
        qs = _max_pool2x(q.reshape(B, H, W, dout), q_pool)
        Hq, Wq = qs.shape[1], qs.shape[2]
        q = qs.reshape(B, Hq * Wq, dout)
    hd = dout // heads
    # NOTE: routing the window shapes through ops.attention.
    # packed_heads_attention (heads sliced in-kernel, no transposes) was
    # measured SLOWER in-context (t_sam 45.6 -> 46.6 ms): the heads
    # transposes it deletes reappear as costlier qkv[:, :, i] slice /
    # window-partition relayouts feeding the kernel's (B, L, dout) blocks.
    # The kernel stays as a tested utility (PERF.md r5 negatives).
    qh = q.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)
    o = dot_product_attention(qh, kh, vh)
    o = o.transpose(0, 2, 1, 3).reshape(B, Hq * Wq, dout)
    return L.linear(p["proj"], o).reshape(B, Hq, Wq, dout)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def hiera_forward(params: Params, cfg: HieraConfig, imgs: Array
                  ) -> List[Array]:
    """imgs (B, H, W, 3) normalized -> stage-end feature maps
    [(B, H_s, W_s, C_s)], highest resolution first."""
    from ...ops.patchify import patch_embed_s4

    # 7x7/s4 patch embed as space-to-depth + one matmul: lax.conv pays
    # ~2.8 ms/keyframe of XLA relayout copies at this shape (PERF.md 6z)
    x = patch_embed_s4(imgs, params["patch"]["w"].astype(imgs.dtype),
                       params["patch"]["b"])
    B, H, W, C = x.shape

    from ...ops.resize import resize_channels_last

    pos = resize_channels_last(params["pos_embed"], (H, W), kind="cubic")
    win = params["pos_embed_window"]
    tiled = jnp.tile(win, (-(-H // win.shape[0]), -(-W // win.shape[1]), 1))
    x = x + (pos + tiled[:H, :W]).astype(x.dtype)

    # The residual stream STAYS in the blocked window layout (B*nW, ws, ws,
    # C) across runs of same-window blocks -- LN/MLP/residual are
    # position-wise and window attention is window-local, so only window-
    # size changes, global-attention blocks, and stage outputs pay a
    # partition/unpartition transpose (2 copies of the full activation each
    # on the old per-block scheme; ~15 total instead of ~90 for hiera_l).
    # Numerics are EXACTLY the per-block scheme's: window padding re-zeroes
    # post-norm1 (reference partitions zeros after norm1, so pad attention
    # keys are the qkv bias either way), and pooled pad lanes never cross
    # into real lanes (stride 2 divides the window size).
    layout = cfg.block_layout()
    outputs: List[Array] = []
    lws = 0            # current blocked window size; 0 = spatial layout
    Hc, Wc = H, W      # true spatial extent of the token map
    Hp = Wp = 0        # window-padded extent while blocked

    def unblock(t: Array, ws: int) -> Array:
        return _window_unpartition(t, ws, Hp // ws, Wp // ws, (Hc, Wc), B)

    for i, (blk, (din, dout, heads, ws, do_pool)) in enumerate(
            zip(params["blocks"], layout)):
        if ws > 0 and lws != ws:
            if lws:
                x = unblock(x, lws)
            x, (Hp, Wp) = _window_partition(x, ws)
            lws = ws
        elif ws == 0 and lws:
            x = unblock(x, lws)
            lws = 0

        xn = L.layer_norm(blk["norm1"], x)
        if lws and (Hp != Hc or Wp != Wc):
            # pads accumulate residual garbage while the layout persists;
            # attention keys must see exact zeros (XLA fuses the multiply
            # into the LN epilogue)
            xn = xn * _pad_mask(B, Hc, Wc, lws).astype(xn.dtype)
        shortcut = x
        if din != dout:
            shortcut = L.linear(blk["proj"], xn)
        if do_pool:
            shortcut = _max_pool2x(shortcut, cfg.q_stride)
        q_pool = cfg.q_stride if do_pool else None
        att = _mh_attention(blk["attn"], xn, heads, dout, q_pool)
        if do_pool:
            Hc, Wc = Hc // cfg.q_stride, Wc // cfg.q_stride
            if lws:
                Hp, Wp = Hp // cfg.q_stride, Wp // cfg.q_stride
                lws //= cfg.q_stride

        x = shortcut + att
        x = x + L.mlp(blk["mlp"], L.layer_norm(blk["norm2"], x))
        if i in cfg.stage_ends:
            outputs.append(unblock(x, lws) if lws else x)
    return outputs

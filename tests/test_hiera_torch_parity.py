"""Forward parity of Hiera blocks against a torch oracle.

The oracle reimplements the published SAM2 Hiera (hieradet) MultiScaleBlock
forward in torch ops: window partition with zero padding, qkv with optional
2x2 query max-pooling inside windows, attention, unpartition with the
post-pool window size, dim-projection shortcut with max-pool. This guards
the window-schedule / layout code that hiera.py's docstring flags as the
subtle part.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ovo_tpu.models.sam.hiera import (HIERA_CONFIGS, hiera_forward,
                                      init_hiera)


def t64(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def lin(p, x):
    return F.linear(x, t64(p["w"]).T,
                    t64(p["b"]) if p.get("b") is not None else None)


def ln(p, x):
    return F.layer_norm(x, (x.shape[-1],), t64(p["scale"]), t64(p["bias"]))


def window_partition(x, ws):
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def window_unpartition(xw, ws, hw_pad, hw):
    Hp, Wp = hw_pad
    C = xw.shape[-1]
    B = xw.shape[0] // (Hp // ws * (Wp // ws))
    x = xw.view(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :hw[0], :hw[1]]


def maxpool2x(x):
    return F.max_pool2d(x.permute(0, 3, 1, 2), 2, 2).permute(0, 2, 3, 1)


def torch_block(blk, x, din, dout, heads, ws, do_pool):
    """Official hieradet MultiScaleBlock forward (torch, f64)."""
    shortcut = x
    xn = ln(blk["norm1"], x)
    if din != dout:
        shortcut = lin(blk["proj"], xn)
    if do_pool:
        shortcut = maxpool2x(shortcut)
    H, W = xn.shape[1], xn.shape[2]
    pad_hw = None
    if ws > 0:
        xw, pad_hw = window_partition(xn, ws)
    else:
        xw = xn

    # MultiScaleAttention
    B_, Hq, Wq, _ = xw.shape
    qkv = lin(blk["attn"]["qkv"], xw.reshape(B_, Hq * Wq, -1))
    qkv = qkv.view(B_, Hq * Wq, 3, dout)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if do_pool:
        q = maxpool2x(q.view(B_, Hq, Wq, dout))
        Hq2, Wq2 = q.shape[1], q.shape[2]
        q = q.reshape(B_, Hq2 * Wq2, dout)
    hd = dout // heads
    qh = q.view(B_, -1, heads, hd).transpose(1, 2)
    kh = k.view(B_, -1, heads, hd).transpose(1, 2)
    vh = v.view(B_, -1, heads, hd).transpose(1, 2)
    o = F.scaled_dot_product_attention(qh, kh, vh)
    o = o.transpose(1, 2).reshape(B_, -1, dout)
    att = lin(blk["attn"]["proj"], o)

    if ws > 0:
        if do_pool:
            pw = ws // 2
            att = att.view(B_, pw, pw, dout)
            att = window_unpartition(
                att, pw, (pad_hw[0] // 2, pad_hw[1] // 2),
                (shortcut.shape[1], shortcut.shape[2]))
        else:
            att = att.view(B_, ws, ws, dout)
            att = window_unpartition(att, ws, pad_hw, (H, W))
    else:
        att = att.view(x.shape[0], shortcut.shape[1], shortcut.shape[2],
                       dout)
    x = shortcut + att
    m = lin(blk["mlp"]["proj"],
            F.gelu(lin(blk["mlp"]["fc"], ln(blk["norm2"], x))))
    return x + m


def torch_hiera_forward(params, cfg, img):
    """Full trunk oracle: patch conv + pos embeds + every block; returns the
    per-stage outputs (also used by scripts/validate_conversion.py)."""
    x = F.conv2d(t64(img).permute(0, 3, 1, 2),
                 t64(params["patch"]["w"]).permute(3, 2, 0, 1),
                 t64(params["patch"]["b"]), stride=4, padding=3)
    x = x.permute(0, 2, 3, 1)
    Ht, Wt = x.shape[1], x.shape[2]
    pos = F.interpolate(t64(params["pos_embed"]).permute(2, 0, 1)[None],
                        size=(Ht, Wt), mode="bicubic",
                        align_corners=False)[0].permute(1, 2, 0)
    win = t64(params["pos_embed_window"])
    wh, ww = win.shape[0], win.shape[1]
    tiled = win.permute(2, 0, 1).tile((-(-Ht // wh), -(-Wt // ww)))
    tiled = tiled.permute(1, 2, 0)[:Ht, :Wt]
    x = x + pos + tiled

    torch_outs = []
    for i, (blk, (din, dout, heads, ws, do_pool)) in enumerate(
            zip(params["blocks"], cfg.block_layout())):
        x = torch_block(blk, x, din, dout, heads, ws, do_pool)
        if i in cfg.stage_ends:
            torch_outs.append(x)
    return torch_outs


import pytest


@pytest.mark.parametrize("S", [64, 72])
def test_hiera_forward_matches_torch_oracle(rng, S):
    """S=64 -> 16x16 tokens, every stage window-aligned. S=72 -> 18x18
    tokens: stage-0/1 windows pad (18->24, 9->12) and the stage-1->2 pool
    runs on an ODD extent (9->4, floor) -- this exercises the blocked-
    layout pad re-zeroing and pad-lane pooling against the reference's
    pad-fresh-zeros-every-block scheme."""
    cfg = HIERA_CONFIGS["hiera_test"]
    params = init_hiera(jax.random.PRNGKey(7), cfg)
    img = rng.standard_normal((1, S, S, 3)).astype(np.float32)

    outs = hiera_forward(params, cfg, jnp.asarray(img))
    torch_outs = torch_hiera_forward(params, cfg, img)

    assert len(outs) == len(torch_outs)
    for got, ref in zip(outs, torch_outs):
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   atol=2e-4, rtol=1e-4)

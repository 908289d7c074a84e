"""Forward parity of the SAM2-class mask decoder against a torch oracle.

The oracle reimplements the published SAM2 MaskDecoder + TwoWayTransformer
forward in torch ops (F.linear, ConvTranspose2d, channelwise LayerNorm,
multi-head attention with internal downsampling) directly from our param
tree. This guards the op-semantics class of bug (e.g. jax conv_transpose's
spatially-flipped kernel vs torch ConvTranspose2d) end-to-end, not just
per-layer.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ovo_tpu.models.sam.decoder import (NUM_MASK_TOKENS, decode_masks,
                                        init_mask_decoder)

D, HEADS, MLP = 64, 8, 128
Hs = Ws = 8          # image-embedding grid
B = 5                # prompts
NP = 2               # sparse prompt tokens per prompt


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def lin(p, x):
    return F.linear(x, t(p["w"]).T, t(p["b"]) if p.get("b") is not None
                    else None)


def ln(p, x):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]))


def attn(p, q, k, v, heads=HEADS):
    qq, kk, vv = lin(p["q"], q), lin(p["k"], k), lin(p["v"], v)
    b, lq, c = qq.shape
    lk = kk.shape[1]
    hd = c // heads
    qq = qq.view(b, lq, heads, hd).transpose(1, 2)
    kk = kk.view(b, lk, heads, hd).transpose(1, 2)
    vv = vv.view(b, lk, heads, hd).transpose(1, 2)
    o = F.scaled_dot_product_attention(qq, kk, vv)
    return lin(p["out"], o.transpose(1, 2).reshape(b, lq, c))


def mlp3(p, x, sigmoid=False):
    x = F.relu(lin(p["l0"], x))
    x = F.relu(lin(p["l1"], x))
    x = lin(p["l2"], x)
    return torch.sigmoid(x) if sigmoid else x


def conv_t(p, x):
    # x NHWC -> torch NCHW; our weights are (kh, kw, Cin, Cout) -> torch
    # ConvTranspose2d expects (Cin, Cout, kh, kw)
    w = t(p["w"]).permute(2, 3, 0, 1)
    y = F.conv_transpose2d(x.permute(0, 3, 1, 2), w, t(p["b"]), stride=2)
    return y.permute(0, 2, 3, 1)


def torch_decoder(params, image_embed, image_pe, sparse, hires):
    prefix = torch.cat([t(params["obj_score_token"])[None],
                        t(params["iou_token"])[None],
                        t(params["mask_tokens"])], 0)
    tokens = torch.cat([prefix[None].expand(B, -1, -1), t(sparse)], 1)
    src = t(image_embed).reshape(1, Hs * Ws, D).expand(B, -1, -1)
    pe = t(image_pe).reshape(1, Hs * Ws, D).expand(B, -1, -1)

    q_pe = tokens
    queries, keys = tokens, src
    for i, layer in enumerate(params["layers"]):
        if i == 0:
            # official skip_first_layer_pe: self-attn REPLACES queries
            queries = attn(layer["self_attn"], queries, queries, queries)
        else:
            q = queries + q_pe
            queries = queries + attn(layer["self_attn"], q, q, queries)
        queries = ln(layer["norm1"], queries)
        q = queries + q_pe
        k = keys + pe
        out = attn(layer["cross_t2i"], q, k, keys)
        queries = ln(layer["norm2"], queries + out)
        m = lin(layer["mlp"]["proj"], F.relu(lin(layer["mlp"]["fc"], queries)))
        queries = ln(layer["norm3"], queries + m)
        q = queries + q_pe   # recomputed post-MLP (official two-way block)
        out = attn(layer["cross_i2t"], k, q, queries)
        keys = ln(layer["norm4"], keys + out)
    q = queries + q_pe
    k = keys + pe
    out = attn(params["final_attn"], q, k, keys)
    queries = ln(params["norm_final"], queries + out)

    obj_token, iou_token = queries[:, 0], queries[:, 1]
    mask_tokens = queries[:, 2:2 + NUM_MASK_TOKENS]

    img = keys.reshape(B, Hs, Ws, D)
    up = conv_t(params["upscale1"], img) + t(hires[1])[None]
    up = F.gelu(ln(params["upscale_ln"], up))
    up = F.gelu(conv_t(params["upscale2"], up) + t(hires[0])[None])

    hyper = torch.stack(
        [mlp3(params["hyper_mlps"][i], mask_tokens[:, i])
         for i in range(NUM_MASK_TOKENS)], 1)
    masks = torch.einsum("bkc,bhwc->bkhw", hyper, up)
    iou = mlp3(params["iou_head"], iou_token, sigmoid=True)
    # sam2 pred_obj_score_head: full 3-layer relu MLP
    obj = mlp3(params["obj_head"], obj_token)[:, 0]
    return masks, iou, obj


def test_decoder_forward_matches_torch_oracle(rng):
    """This caught a real parity bug: decode_masks used jax.nn.gelu
    (default approximate=True, tanh) where torch/SAM2 use exact erf --
    ~1e-3-scale systematic deviation on upscaled features."""
    params = init_mask_decoder(jax.random.PRNGKey(3), d=D, heads=HEADS,
                               mlp_dim=MLP)
    image_embed = rng.standard_normal((Hs, Ws, D)).astype(np.float32)
    image_pe = rng.standard_normal((Hs, Ws, D)).astype(np.float32)
    sparse = rng.standard_normal((B, NP, D)).astype(np.float32)
    hires = [rng.standard_normal((4 * Hs, 4 * Ws, D // 8)).astype(np.float32),
             rng.standard_normal((2 * Hs, 2 * Ws, D // 4)).astype(np.float32)]

    out = decode_masks(params, jnp.asarray(image_embed),
                       jnp.asarray(image_pe), jnp.asarray(sparse),
                       high_res_feats=[jnp.asarray(h) for h in hires],
                       heads=HEADS)
    with torch.no_grad():
        tm, ti, to = torch_decoder(params, image_embed, image_pe, sparse,
                                   hires)
    # f32 accumulation-order noise only (oracle runs f64): observed
    # max-abs ~1e-5 once gelu semantics match
    np.testing.assert_allclose(np.asarray(out["masks"]), tm.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["iou"]), ti.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["obj_score"]), to.numpy(),
                               atol=1e-4)

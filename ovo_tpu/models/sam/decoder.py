"""Mask decoder: two-way transformer + upscaling + hypernetwork heads
(SAM/SAM2 structure; the per-prompt compute behind automatic mask
generation). Every prompt in a keyframe's grid decodes in ONE batched pass.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import layers as L
from ...ops.attention import (_cross_proj_fits, _cross_proj_ln_fits,
                              _on_tpu, cross_attention_small_head,
                              cross_i2t_from_keys, cross_i2t_tail_from_keys,
                              cross_t2i_from_keys, dot_product_attention)
from ...ops.layer_norm import res_ln_fits, residual_layer_norm

Array = jax.Array
Params = Dict[str, Any]

NUM_MASK_TOKENS = 4  # 1 single-mask + 3 multimask outputs


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_attn(key, d: int, internal: int) -> Params:
    ks = jax.random.split(key, 4)
    return {"q": L.init_linear(ks[0], d, internal),
            "k": L.init_linear(ks[1], d, internal),
            "v": L.init_linear(ks[2], d, internal),
            "out": L.init_linear(ks[3], internal, d)}


def _init_twoway_layer(key, d: int, heads: int, mlp_dim: int) -> Params:
    ks = jax.random.split(key, 8)
    return {
        "self_attn": _init_attn(ks[0], d, d),
        "norm1": L.init_layer_norm(d),
        "cross_t2i": _init_attn(ks[1], d, d // 2),
        "norm2": L.init_layer_norm(d),
        "mlp": {"fc": L.init_linear(ks[2], d, mlp_dim),
                "proj": L.init_linear(ks[3], mlp_dim, d)},
        "norm3": L.init_layer_norm(d),
        "cross_i2t": _init_attn(ks[4], d, d // 2),
        "norm4": L.init_layer_norm(d),
    }


def init_mask_decoder(key, d: int = 256, heads: int = 8, depth: int = 2,
                      mlp_dim: int = 2048, high_res: bool = True,
                      obj_token: bool = True) -> Params:
    """``obj_token=False`` / ``high_res=False`` build the SAM1 variant
    (no object-score token/head, no high-res skip convs -- the original
    mask_decoder.py layout)."""
    ks = jax.random.split(key, 16)
    up1 = d // 4      # 64
    up2 = d // 8      # 32
    p: Params = {
        "iou_token": jax.random.normal(ks[0], (d,)) * 0.02,
        "mask_tokens": jax.random.normal(ks[1], (NUM_MASK_TOKENS, d)) * 0.02,
        "layers": [_init_twoway_layer(ks[3 + i], d, heads, mlp_dim)
                   for i in range(depth)],
        "final_attn": _init_attn(ks[6], d, d // 2),
        "norm_final": L.init_layer_norm(d),
        "upscale1": {"w": jax.random.normal(ks[7], (2, 2, d, up1)) * 0.02,
                     "b": jnp.zeros((up1,))},
        "upscale_ln": L.init_layer_norm(up1),
        "upscale2": {"w": jax.random.normal(ks[8], (2, 2, up1, up2)) * 0.02,
                     "b": jnp.zeros((up2,))},
        "hyper_mlps": [
            {"l0": L.init_linear(jax.random.fold_in(ks[9], i), d, d),
             "l1": L.init_linear(jax.random.fold_in(ks[10], i), d, d),
             "l2": L.init_linear(jax.random.fold_in(ks[11], i), d, up2)}
            for i in range(NUM_MASK_TOKENS)],
        "iou_head": {"l0": L.init_linear(ks[12], d, d),
                     "l1": L.init_linear(ks[13], d, d),
                     "l2": L.init_linear(ks[14], d, NUM_MASK_TOKENS)},
    }
    if obj_token:
        p["obj_score_token"] = jax.random.normal(ks[2], (d,)) * 0.02
        # full 3-layer MLP, matching sam2's pred_obj_score_head (a single
        # final linear loses the relu trunk with converted real weights)
        p["obj_head"] = {
            "l0": L.init_linear(jax.random.fold_in(ks[15], 0), d, d),
            "l1": L.init_linear(jax.random.fold_in(ks[15], 1), d, d),
            "l2": L.init_linear(jax.random.fold_in(ks[15], 2), d, 1)}
    if high_res:
        k2 = jax.random.split(ks[5], 2)
        p["conv_s0"] = {"w": jax.random.normal(k2[0], (1, 1, d, up2)) * 0.05,
                        "b": jnp.zeros((up2,))}
        p["conv_s1"] = {"w": jax.random.normal(k2[1], (1, 1, d, up1)) * 0.05,
                        "b": jnp.zeros((up1,))}
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _attn(p: Params, q: Array, k: Array, v: Array, heads: int) -> Array:
    """Multi-head attention where q / k / v may carry batch 1 against the
    others' batch B: projections run on the SMALL batch (a shared image
    embedding projects once, not per prompt) and only the head tensors
    broadcast into the attention."""
    qq = L.linear(p["q"], q)
    kk = L.linear(p["k"], k)
    vv = L.linear(p["v"], v)
    return _attn_core(p["out"], qq, kk, vv, heads)


def _attn_core(p_out: Params, qq: Array, kk: Array, vv: Array,
               heads: int) -> Array:
    """Attention body on PRE-projected internal-dim operands."""
    B = max(qq.shape[0], kk.shape[0])
    Lq, Lk = qq.shape[1], kk.shape[1]
    internal = qq.shape[-1]
    hd = internal // heads

    if (Lq <= 64) != (Lk <= 64):
        # token <-> image cross attention: head dim is internal/heads = 16,
        # hostile to per-head TPU kernels AND to XLA (f32 score tensors in
        # HBM, ~1.6 GB/frame at B=256). The block-diag-packed kernel runs
        # both dots at full 128 lanes with scores VMEM-only and shares
        # batch-1 image operands across the grid (attention.py).
        o = cross_attention_small_head(qq, kk, vv, heads)
        return L.linear(p_out, o)

    def heads_of(t, ln):
        h = t.reshape(t.shape[0], ln, heads, hd).transpose(0, 2, 1, 3)
        if h.shape[0] != B:
            h = jnp.broadcast_to(h, (B,) + h.shape[1:])
        return h

    o = dot_product_attention(heads_of(qq, Lq), heads_of(kk, Lk),
                              heads_of(vv, Lk))
    return L.linear(p_out, o.transpose(0, 2, 1, 3).reshape(B, Lq, internal))


def _img_side_proj(t2i: Params, keys: Array, image_pe: Array,
                   i2t: Optional[Params] = None):
    """XLA-fallback image-side kk/vv projections for cross_t2i, with the
    batch-1 positional term folded in separately -- (keys + pe) @ W ==
    keys @ W + (pe @ W + b), so the big matmuls run on raw keys and the
    pe/bias corrections stay batch-1. Separate dots beat the 6r packed
    one-matmul variant on-chip (PERF.md 6s): each dot writes only its own
    di-wide output with the pe/bias add fused into its epilogue, instead
    of materializing a (B, L, 3*di) intermediate that the slice+add
    epilogues re-read. On TPU the projection-fused cross kernels
    (_t2i_proj/_i2t_proj) replace this path entirely."""
    kk = keys @ t2i["k"]["w"].astype(keys.dtype) + L.linear(t2i["k"],
                                                            image_pe)
    vv = keys @ t2i["v"]["w"].astype(keys.dtype)
    if t2i["v"].get("b") is not None:
        vv = vv + t2i["v"]["b"].astype(vv.dtype)
    return kk, vv, None


def _use_proj_kernels(T: int, L_img: int, di: int, dk: int, heads: int,
                      itemsize: int) -> bool:
    """Route the cross attentions through the projection-fused Pallas
    kernels (attention.cross_t2i_from_keys / cross_i2t_from_keys): the
    image-side kk/vv/qq never materialize in HBM -- at the AMG shape that
    deletes four (B, 4096, 128) projection tensors plus their keys-stream
    reads per two-way layer. Off-TPU / unfit shapes / OVO_NO_PALLAS=1
    keep the XLA path (_img_side_proj + _attn_core)."""
    import os

    if os.environ.get("OVO_NO_PALLAS") == "1" or not _on_tpu():
        return False
    HT = heads * (T + ((-T) % 8))
    return _cross_proj_fits(HT, L_img, di, dk, itemsize)


def _t2i_proj(t2i: Params, q: Array, keys: Array, image_pe: Array,
              heads: int) -> Array:
    """Token -> image cross attention, image-side projections in-kernel.
    pe_k = image_pe @ Wk + bk is the batch-1 internal-dim correction
    ((keys + pe) @ W == keys @ W + (pe @ W + b))."""
    di = t2i["k"]["w"].shape[1]
    pe_k = L.linear(t2i["k"], image_pe)
    bv = t2i["v"].get("b")
    bv = jnp.zeros((di,), jnp.float32) if bv is None else bv
    o = cross_t2i_from_keys(L.linear(t2i["q"], q), keys, t2i["k"]["w"],
                            t2i["v"]["w"], pe_k, bv, heads)
    return L.linear(t2i["out"], o)


def _i2t_proj(i2t: Params, q: Array, queries: Array, keys: Array,
              image_pe: Array, heads: int) -> Array:
    """Image -> token cross attention, image-side qq in-kernel."""
    pe_q = L.linear(i2t["q"], image_pe)
    o = cross_i2t_from_keys(keys, i2t["q"]["w"], pe_q,
                            L.linear(i2t["k"], q),
                            L.linear(i2t["v"], queries), heads)
    return L.linear(i2t["out"], o)


def _i2t_tail(i2t: Params, norm4: Params, q: Array, queries: Array,
              keys: Array, image_pe: Array, heads: int) -> Array:
    """The whole image-side update in ONE kernel: i2t cross attention +
    out-projection + keys residual + norm4. The attention's keys block is
    already VMEM-resident, so the tail adds zero HBM traffic -- vs the XLA
    chain's three materializations of (B, L, ·) tensors (PERF.md 6x).
    Returns the next layer's keys directly."""
    pe_q = L.linear(i2t["q"], image_pe)
    bout = i2t["out"].get("b")
    dk = keys.shape[-1]
    bout = jnp.zeros((dk,), jnp.float32) if bout is None else bout
    return cross_i2t_tail_from_keys(
        keys, i2t["q"]["w"], pe_q, L.linear(i2t["k"], q),
        L.linear(i2t["v"], queries), i2t["out"]["w"], bout,
        norm4["scale"], norm4["bias"], heads)


def _norm4(p: Params, attn_out: Array, keys: Array, B: int) -> Array:
    """Image-side residual + LN. At the AMG shape ((B=256, 4096, 256)
    bf16, 537 MB) this chain is the decoder's single biggest HBM item:
    XLA runs a residual-add fusion plus a three-read LN (~3.8 GB traced),
    so it routes through the one-pass fused Pallas kernel
    (ops/layer_norm.residual_layer_norm); a batch-1 keys residual (first
    layer) is shared across the grid without materializing the
    broadcast. Small shapes / CPU / OVO_NO_PALLAS=1 keep the XLA path."""
    import os

    Lk, C = attn_out.shape[1], attn_out.shape[2]
    if (os.environ.get("OVO_NO_PALLAS") != "1" and _on_tpu()
            and res_ln_fits(B, Lk, C, attn_out.dtype.itemsize)):
        return residual_layer_norm(attn_out, keys, p["scale"], p["bias"])
    if keys.shape[0] != B:
        keys = jnp.broadcast_to(keys, (B,) + keys.shape[1:])
    return L.layer_norm(p, keys + attn_out)


def _mlp3(p: Params, x: Array, sigmoid_out: bool = False) -> Array:
    x = jax.nn.relu(L.linear(p["l0"], x))
    x = jax.nn.relu(L.linear(p["l1"], x))
    x = L.linear(p["l2"], x)
    return jax.nn.sigmoid(x) if sigmoid_out else x


def two_way_transformer(params: Params, tokens: Array, image: Array,
                        image_pe: Array, heads: int = 8) -> Tuple[Array, Array]:
    """tokens (B, T, d) queries; image (1 or B, L, d) keys; returns
    (tokens, image) after the two-way layers + final token-to-image
    attention. The image side may enter with batch 1 (AMG: every prompt
    shares the image embedding): its projections in the FIRST layer then
    run once instead of per prompt, and the per-prompt divergence starts
    only at the first image-side residual write -- ~5 ms/keyframe of
    (B, 4096, ·) HBM traffic saved at B=256 (PERF.md)."""
    B, T = tokens.shape[0], tokens.shape[1]
    dk = image.shape[-1]
    di = params["layers"][0]["cross_t2i"]["k"]["w"].shape[1]
    q_pe = tokens  # token embeddings double as their positional encoding
    queries, keys = tokens, image
    use_proj = _use_proj_kernels(T, image.shape[1], di, dk, heads,
                                 tokens.dtype.itemsize)
    HT = heads * (T + ((-T) % 8))
    use_tail = use_proj and _cross_proj_ln_fits(
        HT, image.shape[1], di, dk, tokens.dtype.itemsize)
    for i, layer in enumerate(params["layers"]):
        if i == 0:
            # official skip_first_layer_pe semantics: the first layer's
            # self-attention output REPLACES queries -- no residual add
            # (segment_anything transformer.py TwoWayAttentionBlock;
            # sam2 sam/transformer.py is identical)
            queries = _attn(layer["self_attn"], queries, queries, queries,
                            heads)
        else:
            q = queries + q_pe
            queries = queries + _attn(layer["self_attn"], q, q, queries,
                                      heads)
        queries = L.layer_norm(layer["norm1"], queries)
        q = queries + q_pe
        if use_proj:
            attn_out = _t2i_proj(layer["cross_t2i"], q, keys, image_pe,
                                 heads)
        else:
            kk_img, vv_img, _ = _img_side_proj(layer["cross_t2i"], keys,
                                               image_pe, None)
            attn_out = _attn_core(layer["cross_t2i"]["out"],
                                  L.linear(layer["cross_t2i"]["q"], q),
                                  kk_img, vv_img, heads)
        queries = L.layer_norm(layer["norm2"], queries + attn_out)
        queries = L.layer_norm(
            layer["norm3"], queries + L.mlp(layer["mlp"], queries,
                                            act=jax.nn.relu))
        # q is RECOMPUTED from the post-MLP queries (official two-way
        # block) -- the pre-norm2 q here was a parity bug fixed in r4
        q = queries + q_pe
        if use_proj and use_tail:
            # i2t + out-proj + residual + norm4 in ONE kernel (PERF.md 6x)
            keys = _i2t_tail(layer["cross_i2t"], layer["norm4"], q,
                             queries, keys, image_pe, heads)
        elif use_proj:
            attn_out = _i2t_proj(layer["cross_i2t"], q, queries, keys,
                                 image_pe, heads)
            keys = _norm4(layer["norm4"], attn_out, keys, B)
        else:
            qq_img = (keys @ layer["cross_i2t"]["q"]["w"].astype(keys.dtype)
                      + L.linear(layer["cross_i2t"]["q"], image_pe))
            attn_out = _attn_core(layer["cross_i2t"]["out"], qq_img,
                                  L.linear(layer["cross_i2t"]["k"], q),
                                  L.linear(layer["cross_i2t"]["v"], queries),
                                  heads)
            keys = _norm4(layer["norm4"], attn_out, keys, B)
    q = queries + q_pe
    if use_proj:
        attn_out = _t2i_proj(params["final_attn"], q, keys, image_pe, heads)
    else:
        kk_img, vv_img, _ = _img_side_proj(params["final_attn"], keys,
                                           image_pe, None)
        attn_out = _attn_core(params["final_attn"]["out"],
                              L.linear(params["final_attn"]["q"], q),
                              kk_img, vv_img, heads)
    queries = L.layer_norm(params["norm_final"], queries + attn_out)
    return queries, keys


def _conv_transpose2x(p: Params, x: Array) -> Array:
    """2x2/stride-2 transposed conv as ONE MXU matmul + depth-to-space:
    each output pixel receives exactly one tap, so the kernel is a plain
    (Cin, 2*2*Cout) matmul followed by a block reshape (XLA's conv_transpose
    lowering here profiled ~3x slower than the matmul form)."""
    B, H, W, Cin = x.shape
    y = _up_blocked(p, x.reshape(B, H, W, Cin))    # (B, H, W, 2, 2, Cout)
    Cout = y.shape[-1]
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, Cout)


def _up_blocked(p: Params, x: Array) -> Array:
    """The same transposed conv WITHOUT the depth-to-space transpose: input
    rows (..., Cin) -> (..., 2, 2, Cout) where (i, j) index the 2x2 output
    block of each input pixel. The per-prompt upscale chain stays in this
    blocked layout end-to-end (bias/LN/gelu/skip-add/hypernet dot are all
    spatial-order-agnostic), killing ~10 ms/keyframe of 0.5 GB layout
    copies the depth-to-space transposes cost at B=256 (PERF.md); ONE
    einsum at the very end emits masks in true raster order."""
    w = p["w"].astype(x.dtype)                     # (2, 2, Cin, Cout)
    Cin, Cout = w.shape[2], w.shape[3]
    wm = w.transpose(2, 0, 1, 3).reshape(Cin, 4 * Cout)
    lead = x.shape[:-1]
    y = (x.reshape(-1, Cin) @ wm).reshape(lead + (2, 2, Cout))
    return y + p["b"].astype(x.dtype)


def decode_masks(params: Params, image_embed: Array, image_pe: Array,
                 sparse_prompts: Array,
                 high_res_feats: Optional[List[Array]] = None,
                 heads: int = 8,
                 mask_channels: Optional[Tuple[int, ...]] = None,
                 blocked: bool = False,
                 top_prompts: Optional[int] = None) -> Dict[str, Array]:
    """One batched decoding pass.

    image_embed: (H, W, d) shared image embedding (stride 16);
    image_pe:    (H, W, d) dense positional encoding;
    sparse_prompts: (B, Np, d) per-prompt sparse embeddings;
    high_res_feats: optional [(4H, 4W, up2), (2H, 2W, up1)] skip features;
    mask_channels: which of the 4 mask tokens to hypernet+rasterize
      (default all; AMG passes (1, 2, 3) -- multimask only -- to skip 25%
      of the mask einsum and logits materialization).
    top_prompts: if set (< B), gate the EXPENSIVE per-prompt tail: the
      predicted IoU comes from the iou token alone, so after the two-way
      transformer only the top_prompts prompts by max-channel predicted IoU
      pay the upscale chain + hypernet + mask einsum (537 MB + 1.07 GB +
      0.2 GB of HBM writes per keyframe at B=256, PERF.md 6h). Selection is
      exactly "ungated output restricted to the selected prompts" (indices
      returned as ``prompt_sel``, ascending prompt order). The reference
      AMG's own first filter is this same predicted-IoU signal
      (segment_utils.py:195-259 pred_iou_thresh), applied post-decode.

    Returns {"masks": (B', C, 4H, 4W) logits over mask_channels,
             "iou": (B', C), "obj_score": (B',), "prompt_sel": (B',)}
    where B' = top_prompts if gating is active else B.
    With ``blocked=True`` masks come back as (B', C, H, W, 2, 2, 2, 2) in
    the upscaler's native blocked layout -- pixel (4h+2i+p, 4w+2j+q) at
    index (h, w, i, j, p, q) -- skipping the raster relayout copy (AMG's
    order-agnostic consumers read it directly).
    """
    B = sparse_prompts.shape[0]
    H, W, d = image_embed.shape
    cdtype = image_embed.dtype
    # SAM1-variant decoders (init obj_token=False / converted SAM1 ckpts)
    # carry no object-score token: tokens = iou + 4 mask tokens only
    has_obj = "obj_score_token" in params
    head = ([params["obj_score_token"][None]] if has_obj else [])
    prefix = jnp.concatenate(
        head + [params["iou_token"][None], params["mask_tokens"]],
        axis=0).astype(cdtype)                             # (1|2 + 4, d)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(prefix, (B, prefix.shape[0], d)),
         sparse_prompts.astype(cdtype)], axis=1)

    # image side enters batch-1: the first two-way layer projects it ONCE
    src = image_embed.reshape(1, H * W, d)
    pe = image_pe.reshape(1, H * W, d).astype(cdtype)
    queries, keys = two_way_transformer(params, tokens, src, pe, heads)

    off = 1 if has_obj else 0
    obj_token = queries[:, 0] if has_obj else None
    iou_token = queries[:, off]
    mask_tokens = queries[:, off + 1:off + 1 + NUM_MASK_TOKENS]

    chans = tuple(range(NUM_MASK_TOKENS)) if mask_channels is None \
        else tuple(mask_channels)
    iou_all = _mlp3(params["iou_head"], iou_token,
                    sigmoid_out=True)[:, list(chans)]       # (B, C)
    prompt_sel = jnp.arange(B)
    if top_prompts is not None and top_prompts < B:
        gate = jnp.max(iou_all, axis=1)                     # (B,)
        # ascending index order so the output IS the ungated output
        # restricted to the selected prompts (pinned by test_sam gating
        # parity); stable argsort keeps tie-breaks deterministic
        prompt_sel = jnp.sort(
            jnp.argsort(-gate, stable=True)[:top_prompts])
        keys = keys[prompt_sel]
        mask_tokens = mask_tokens[prompt_sel]
        if obj_token is not None:
            obj_token = obj_token[prompt_sel]
        iou_all = iou_all[prompt_sel]
        B = top_prompts

    # ---- upscale chain in BLOCKED layout (see _up_blocked): the (B, 4H,
    # 4W, ·) per-prompt tensors never materialize in raster order ----
    img = keys.reshape(B, H, W, d)
    up = _up_blocked(params["upscale1"], img)       # (B, H, W, 2, 2, up1)
    if high_res_feats is not None:
        hr1 = high_res_feats[1]                     # (2H, 2W, up1) raster
        up = up + hr1.reshape(H, 2, W, 2, -1).transpose(0, 2, 1, 3, 4)[None]
    up = L.gelu(L.layer_norm(params["upscale_ln"], up))  # exact erf (torch)

    hyper = jnp.stack([_mlp3(params["hyper_mlps"][i], mask_tokens[:, i])
                       for i in chans], axis=1)            # (B, C, up2)

    # NOTE a fused Pallas tail (upscale2+bias+hr0+gelu+hypernet in one
    # kernel, ops/mask_tail.py) was built and measured SLOWER (36.7 vs
    # 14.7 ms standalone at B=256): the C=3 hypernet output forces 12-of-
    # 128-lane masked stores and the per-tap dots underfill the MXU
    # (PERF.md 6i). It remains a tested utility; XLA stays the prod path.
    up = _up_blocked(params["upscale2"], up)    # (B, H, W, 2, 2, 2, 2, up2)
    if high_res_feats is not None:
        hr0 = high_res_feats[0]                     # (4H, 4W, up2) raster
        up = up + hr0.reshape(H, 2, 2, W, 2, 2, -1).transpose(
            0, 3, 1, 4, 2, 5, 6)[None]
    up = L.gelu(up)

    if blocked:
        # emit logits in the decoder-native blocked layout (B, C, H, W, 2,
        # 2, 2, 2) -- pixel (4h+2i+p, 4w+2j+q) at index (h, w, i, j, p, q).
        # Every AMG consumer is spatial-order-agnostic (sums, intersection
        # matmuls, coordinate tensors), and the final full-res bilinear
        # upsample reads the blocked order directly by reshaping its
        # WEIGHT matrix (amg.upsample_bilinear_matmul_blocked), so the
        # raster relayout of this (B, 4H, 4W, up2)-sized tensor (~7 ms/
        # keyframe of pure layout copies at B=256, PERF.md) never happens.
        # flatten the blocked spatial dims (row-major -> free bitcast) so
        # the dot is a plain BMM: an 8-D dot makes XLA pick exotic layouts
        # and re-copy both operands (traced +3 ms vs the raster path)
        C = up.shape[-1]
        masks = jnp.einsum("bkc,bsc->bks", hyper, up.reshape(B, -1, C),
                           preferred_element_type=jnp.float32)
        masks = masks.reshape((B, masks.shape[1]) + up.shape[1:-1])
    else:
        # ONE relayout to raster order -- pixel (4h+2i+p, 4w+2j+q); the 8-D
        # einsum variant that emitted raster directly made XLA materialize a
        # f32 post-matmul transpose 3x bigger than this bf16 one (PERF.md)
        up = up.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            B, 4 * H, 4 * W, -1)
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up,
                           preferred_element_type=jnp.float32)
    if obj_token is None:
        obj = jnp.zeros((B,), jnp.float32)   # SAM1: no object-score head
    else:
        oh = params["obj_head"]
        obj = (_mlp3(oh, obj_token) if "l0" in oh
               else L.linear(oh, obj_token))[:, 0]  # legacy 1-linear ckpts
    return {"masks": masks, "iou": iou_all, "obj_score": obj,
            "prompt_sel": prompt_sel}

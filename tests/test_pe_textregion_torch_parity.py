"""Full-tower torch-oracle parity for the Perception-Encoder CLIP family
and the COMPLETE TextRegion program.

The oracle re-expresses the published PE/TextRegion forward semantics in
naive torch f64 (reference behavior: /root/reference/ovo/entities/
textregion.py:9-204 and the PE tower it drives through
vlm.visual.forward_features / attn_pool):

  - ViT: conv patchify, cls token, abs pos (bilinear interp off-grid),
    pre-LN blocks with axial RoPE-2D on q/k, ln_post
  - probe attention pooling + projection (encode_image)
  - causal text tower with argmax (EOT) pooling (encode_text)
  - TextRegion: multi-resolution crop grid, resize_features half-weight
    blend, soft feature masks, remove_global_patch, masked attention pool
    through the probe head, project + L2-normalize

Tested on the "tiny-pe" card (PE structure at test scale, f32 compute on
our side, f64 on the oracle side).
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ovo_tpu.models.clip import CLIPModel
from ovo_tpu.models import vit as vit_mod
from ovo_tpu.models import text as text_mod
from ovo_tpu.models.textregion import TextRegionEmbedder


def t64(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def lin(p, x):
    return F.linear(x, t64(p["w"]).T,
                    t64(p["b"]) if p.get("b") is not None else None)


def ln(p, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t64(p["scale"]), t64(p["bias"]),
                        eps=eps)


# ---------------------------------------------------------------------------
# torch PE ViT oracle
# ---------------------------------------------------------------------------

def rope2d_tables(grid, head_dim, n_prefix, theta=10000.0):
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (torch.arange(quarter, dtype=torch.float64)
                             / quarter))
    ys, xs = torch.meshgrid(torch.arange(grid, dtype=torch.float64),
                            torch.arange(grid, dtype=torch.float64),
                            indexing="ij")
    ang_x = xs.reshape(-1, 1) * freqs
    ang_y = ys.reshape(-1, 1) * freqs
    ang = torch.cat([ang_x, ang_y], dim=-1)            # (L, head_dim/2)
    if n_prefix:
        ang = torch.cat([torch.zeros(n_prefix, ang.shape[-1],
                                     dtype=torch.float64), ang])
    return torch.cos(ang), torch.sin(ang)


def apply_rope_t(x, cos, sin):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat([x1 * cos - x2 * sin, x1 * sin + x2 * cos], dim=-1)


def torch_mha(p, x, n_heads, rope=None, causal=False):
    B, L, D = x.shape
    hd = D // n_heads
    qkv = lin(p["qkv"], x)
    q, k, v = qkv.chunk(3, dim=-1)

    def heads(t):
        return t.view(B, L, n_heads, hd).permute(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if rope is not None:
        cos, sin = rope
        q = apply_rope_t(q, cos[:L], sin[:L])
        k = apply_rope_t(k, cos[:L], sin[:L])
    logits = (q @ k.transpose(-1, -2)) * hd ** -0.5
    if causal:
        mask = torch.triu(torch.ones(L, L, dtype=torch.bool), diagonal=1)
        logits = logits.masked_fill(mask, float("-inf"))
    o = torch.softmax(logits, dim=-1) @ v
    o = o.permute(0, 2, 1, 3).reshape(B, L, D)
    return lin(p["out"], o)


def torch_block(p, x, n_heads, rope=None, causal=False):
    x = x + torch_mha(p["attn"], ln(p["ln1"], x), n_heads, rope=rope,
                      causal=causal)
    h = lin(p["mlp"]["fc"], ln(p["ln2"], x))
    h = F.gelu(h, approximate="none")
    return x + lin(p["mlp"]["proj"], h)


def torch_forward_features(params, cfg, imgs):
    """imgs (B, H, W, 3) f64 in model input scale -> (B, n_tokens, width)."""
    w = t64(params["patch"]["w"]).permute(3, 2, 0, 1)   # HWIO -> OIHW
    x = F.conv2d(imgs.permute(0, 3, 1, 2), w, t64(params["patch"]["b"]),
                 stride=cfg.patch_size)
    B, width, gh, gw = x.shape
    grid = gh
    x = x.permute(0, 2, 3, 1).reshape(B, gh * gw, width)
    n_prefix = 1 if cfg.use_cls_token else 0
    if cfg.use_cls_token:
        cls = t64(params["cls"]).expand(B, 1, width)
        x = torch.cat([cls, x], dim=1)
    if cfg.use_abs_pos:
        pos = t64(params["pos"])
        if grid != cfg.grid:
            prefix, gp = pos[:n_prefix], pos[n_prefix:]
            gp = gp.reshape(1, cfg.grid, cfg.grid, width).permute(0, 3, 1, 2)
            gp = F.interpolate(gp, (grid, grid), mode="bilinear",
                               align_corners=False)
            gp = gp.permute(0, 2, 3, 1).reshape(grid * grid, width)
            pos = torch.cat([prefix, gp])
        x = x + pos
    rope = None
    if cfg.use_rope2d:
        rope = rope2d_tables(grid, cfg.width // cfg.n_heads, n_prefix)
    for blk in params["blocks"]:
        x = torch_block(blk, x, cfg.n_heads, rope=rope)
    return ln(params["ln_post"], x)


def torch_attn_pool(p, x, n_heads, key_mask=None):
    """Probe pooling: q = probe, k = LN(x), v = x (the PE head)."""
    B, L, D = x.shape
    hd = D // n_heads
    q = lin(p["q"], t64(p["probe"]).expand(B, 1, D))
    k = lin(p["k"], ln(p["ln"], x))
    v = lin(p["v"], x)
    qh = q.view(B, 1, n_heads, hd).permute(0, 2, 1, 3)
    kh = k.view(B, L, n_heads, hd).permute(0, 2, 1, 3)
    vh = v.view(B, L, n_heads, hd).permute(0, 2, 1, 3)
    logits = (qh @ kh.transpose(-1, -2)) * hd ** -0.5
    if key_mask is not None:
        logits = logits.masked_fill(~key_mask.view(B, 1, 1, L),
                                    float("-inf"))
    o = torch.softmax(logits, dim=-1) @ vh
    return lin(p["out"], o.permute(0, 2, 1, 3).reshape(B, D))


def torch_encode_image(params, cfg, imgs):
    x = torch_forward_features(params, cfg, imgs)
    pooled = torch_attn_pool(params["attn_pool"], x, cfg.n_heads)
    return pooled @ t64(params["proj"])


def torch_encode_text(params, cfg, tokens):
    tok = torch.tensor(np.asarray(tokens), dtype=torch.long)
    x = t64(params["tok_embed"])[tok] + t64(params["pos"])
    for blk in params["blocks"]:
        x = torch_block(blk, x, cfg.n_heads, causal=cfg.causal)
    x = ln(params["ln_final"], x)
    idx = tok.argmax(dim=-1)
    pooled = x[torch.arange(x.shape[0]), idx]
    return pooled @ t64(params["proj"])


# ---------------------------------------------------------------------------
# torch TextRegion oracle (reference textregion.py:9-204 semantics)
# ---------------------------------------------------------------------------

def torch_preprocess(img_hw3, size, mean, std):
    x = img_hw3.permute(2, 0, 1).unsqueeze(0)
    x = F.interpolate(x, (size, size), mode="bilinear", align_corners=False)
    x = x.squeeze(0).permute(1, 2, 0)
    return (x - t64(mean)) / t64(std)


def torch_textregion(model, image_hw3_01, masks, threshold):
    """Full reference pipeline in torch f64 on OUR params: multi-res crops,
    resize_features blend (0.5*global + crop), soft masks,
    remove_global_patch, masked probe pooling, project + normalize."""
    params, cfg = model.params["visual"], model.cfg.vision
    mean, std = np.asarray(model._mean), np.asarray(model._std)
    img = t64(image_hw3_01)
    h, w = img.shape[:2]
    crop_size, patch = cfg.image_size, cfg.patch_size
    patch_num = crop_size // patch
    ch, cw = max(h // crop_size, 1), max(w // crop_size, 1)
    pph, ppw = patch_num * ch, patch_num * cw
    crop_h, crop_w = int(np.ceil(h / ch)), int(np.ceil(w / cw))

    views = [torch_preprocess(img, crop_size, mean, std)]
    for hi in range(ch):
        for wi in range(cw):
            y2 = min(hi * crop_h + crop_h, h)
            x2 = min(wi * crop_w + crop_w, w)
            y1, x1 = max(y2 - crop_h, 0), max(x2 - crop_w, 0)
            views.append(torch_preprocess(img[y1:y2, x1:x2], crop_size,
                                          mean, std))
    tokens = torch_forward_features(params, cfg, torch.stack(views))
    n_prefix = 1 if cfg.use_cls_token else 0
    tokens = tokens[:, n_prefix:]

    # resize_features (reference :9-28): upsample global, blend tiles at
    # 0.5 * global + crop
    D = tokens.shape[-1]
    g = tokens[0].view(patch_num, patch_num, D).permute(2, 0, 1).unsqueeze(0)
    canvas = F.interpolate(g, (pph, ppw), mode="bilinear",
                           align_corners=False).squeeze(0)
    crop_id = 1
    for hi in range(ch):
        for wi in range(cw):
            y0, x0 = hi * patch_num, wi * patch_num
            tile = tokens[crop_id].view(patch_num, patch_num, D)
            canvas[:, y0:y0 + patch_num, x0:x0 + patch_num] = \
                0.5 * canvas[:, y0:y0 + patch_num, x0:x0 + patch_num] \
                + tile.permute(2, 0, 1)
            crop_id += 1
    x_input = canvas.view(D, pph * ppw).T                       # (L, D)

    # soft feature masks (reference :145-161)
    fm = F.interpolate(t64(masks).unsqueeze(0), (pph, ppw),
                       mode="bilinear", align_corners=False)
    fm = fm.reshape(-1, pph * ppw).clamp(0, 1)

    # remove_global_patch (reference :31-50)
    unit = x_input / x_input.norm(dim=-1, keepdim=True)
    sim = unit @ unit.T
    inside = (fm > 0).double()
    p2r = sim @ inside.T
    p2r_avg = p2r / inside.sum(dim=-1)
    belong = (p2r_avg * inside.T).sum(-1) / (inside.sum(dim=0) + 1e-9)
    outside = (fm == 0).double()
    out_sc = (p2r_avg * outside.T).sum(-1) / (outside.sum(dim=0) + 1e-9)
    fm[:, (belong - out_sc) < threshold] = 0

    # masked probe pooling (reference :163-195): all keys = LN(mean tokens)
    M = fm.shape[0]
    pool = params["attn_pool"]
    x = x_input.unsqueeze(0).expand(M, -1, -1)
    k_row = ln(pool["ln"], x_input.mean(dim=0, keepdim=True))
    k = lin(pool["k"], k_row).expand(x.shape[1], -1).unsqueeze(0) \
        .expand(M, -1, -1)
    q = lin(pool["q"], t64(pool["probe"]).expand(M, 1, -1))
    v = lin(pool["v"], x)
    n_heads = cfg.n_heads
    hd = D // n_heads
    qh = q.view(M, 1, n_heads, hd).permute(0, 2, 1, 3)
    kh = k.view(M, -1, n_heads, hd).permute(0, 2, 1, 3)
    vh = v.view(M, -1, n_heads, hd).permute(0, 2, 1, 3)
    logits = (qh @ kh.transpose(-1, -2)) * hd ** -0.5
    logits = logits.masked_fill((fm <= 0).view(M, 1, 1, -1), float("-inf"))
    o = torch.softmax(logits, dim=-1) @ vh
    pooled = lin(pool["out"], o.permute(0, 2, 1, 3).reshape(M, D))
    region = pooled @ t64(params["proj"])
    return F.normalize(region, dim=-1), fm


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

ATOL = 2e-4   # f32 tower vs f64 oracle over 3 blocks


def test_pe_forward_features_parity(rng):
    model = CLIPModel.random_init("tiny-pe")
    cfg = model.cfg.vision
    imgs = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(vit_mod.forward_features(
        model.params["visual"], cfg, jnp.asarray(imgs)))
    ref = torch_forward_features(model.params["visual"], cfg,
                                 t64(imgs)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_pe_forward_features_offgrid_pos_interp(rng):
    """96x96 input: 6x6 grid vs the 4x4 trained pos-embed exercises the
    bilinear pos interpolation AND off-grid RoPE tables."""
    model = CLIPModel.random_init("tiny-pe")
    cfg = model.cfg.vision
    imgs = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    ours = np.asarray(vit_mod.forward_features(
        model.params["visual"], cfg, jnp.asarray(imgs)))
    ref = torch_forward_features(model.params["visual"], cfg,
                                 t64(imgs)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_pe_encode_image_parity(rng):
    model = CLIPModel.random_init("tiny-pe")
    imgs = rng.random((2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(model.encode_image(jnp.asarray(imgs)))
    pre = (t64(imgs) - t64(np.asarray(model._mean))) / \
        t64(np.asarray(model._std))
    ref = torch_encode_image(model.params["visual"], model.cfg.vision,
                             pre).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_pe_encode_text_parity():
    model = CLIPModel.random_init("tiny-pe")
    # hand-built token rows inside the tiny vocab: BOS ... EOT(max id) pad
    tokens = np.zeros((2, 16), np.int32)
    tokens[0, :6] = [1, 5, 9, 320, 7, 1023]
    tokens[1, :4] = [1, 800, 41, 1023]
    ours = np.asarray(text_mod.encode_text(
        model.params["text"], model.cfg.text, jnp.asarray(tokens)))
    ref = torch_encode_text(model.params["text"], model.cfg.text,
                            tokens).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL)


def test_textregion_full_program_parity(rng):
    """The COMPLETE TextRegion program (multi-res crops + blend + soft masks
    + remove_global_patch + masked probe pooling + projection) against the
    torch oracle of reference textregion.py:9-204."""
    model = CLIPModel.random_init("tiny-pe")
    emb = TextRegionEmbedder(model, resize_method="multi_resolution",
                             remove_global_patch=True,
                             global_patch_threshold=0.07)
    h, w = 96, 160   # 1x2 crop grid + global view
    image = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    masks = np.zeros((3, h, w), bool)
    masks[0, :50, :70] = True
    masks[1, 40:, 90:] = True
    masks[2, 20:80, 40:120] = True

    ours = np.asarray(emb.embed_masks(image, masks, np.ones(3, bool)))
    ref, fm_ref = torch_textregion(model, image.astype(np.float64) / 255.0,
                                   masks.astype(np.float64), 0.07)
    assert (fm_ref.sum(dim=-1) > 0).all(), "oracle masks fully removed"
    np.testing.assert_allclose(ours, ref.numpy(), atol=5e-4)
    # normalized descriptors: cosine agreement essentially exact
    cos = (ours * ref.numpy()).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)


def test_textregion_remove_global_patch_changes_masks(rng):
    """Sanity: with a high threshold the removal path must actually zero
    patches (guards against a silently inert implementation)."""
    from ovo_tpu.models.textregion import _remove_global_patch

    x = jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32))
    fmask = jnp.asarray((rng.random((4, 32)) > 0.4).astype(np.float32))
    out = np.asarray(_remove_global_patch(x, fmask, threshold=0.9))
    assert (out.sum() < np.asarray(fmask).sum())

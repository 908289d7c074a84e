"""SAM1 tier (ViT-det encoder + objectless decoder + pad-preprocess).

The reference loads SAM1 through ``sam_model_registry`` when
``sam_version: ""`` (segment_utils.py:275-288, vit_b / vit_h cards). Here:

  1. a torch-f64 oracle reimplementing the published segment_anything
     ViT-det forward (window partition, decomposed rel-pos attention,
     LayerNorm2d neck) pins the JAX encoder;
  2. the SAM1 decoder variant (no object-score token, no high-res skips)
     is checked for token-layout correctness and prompt gating;
  3. preprocess geometry (ResizeLongestSide + pad) and the AMG program's
     pad suppression / crop-composed upsampling run end-to-end on the
     vit_test card with a non-square image.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from ovo_tpu.models.sam.model import SAMConfig, SAMModel
from ovo_tpu.models.sam.vitdet import (VITDET_CONFIGS, init_vitdet,
                                       vitdet_forward)


def t64(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def lin(p, x):
    return F.linear(x, t64(p["w"]).T,
                    t64(p["b"]) if p.get("b") is not None else None)


def ln(p, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t64(p["scale"]), t64(p["bias"]),
                        eps=eps)


# ---------------------------------------------------------------------------
# torch oracle (published segment_anything image_encoder.py semantics)
# ---------------------------------------------------------------------------

def window_partition(x, ws):
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def window_unpartition(xw, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    C = xw.shape[-1]
    B = xw.shape[0] // (Hp // ws * (Wp // ws))
    x = xw.view(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :hw[0], :hw[1]]


def get_rel_pos(q_size, k_size, rel_pos):
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = F.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist, mode="linear").reshape(-1, max_rel_dist
                                                      ).permute(1, 0)
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.long()]


def torch_attention(p, x, heads):
    B, H, W, C = x.shape
    dh = C // heads
    qkv = lin(p["qkv"], x.reshape(B, H * W, C)).reshape(
        B, H * W, 3, heads, dh).permute(2, 0, 3, 1, 4)
    q, k, v = (t.reshape(B * heads, H * W, dh) for t in qkv)
    attn = (q * dh ** -0.5) @ k.transpose(-2, -1)
    Rh = get_rel_pos(H, H, t64(p["rel_pos_h"]))
    Rw = get_rel_pos(W, W, t64(p["rel_pos_w"]))
    r_q = q.reshape(B * heads, H, W, dh)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (attn.view(B * heads, H, W, H, W)
            + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
            ).view(B * heads, H * W, H * W)
    attn = attn.softmax(dim=-1)
    x = (attn @ v).view(B, heads, H * W, dh).permute(0, 2, 1, 3).reshape(
        B, H, W, C)
    return lin(p["proj"], x)


def torch_vitdet_forward(params, cfg, img):
    x = F.conv2d(t64(img).permute(0, 3, 1, 2),
                 t64(params["patch"]["w"]).permute(3, 2, 0, 1),
                 t64(params["patch"]["b"]), stride=cfg.patch)
    x = x.permute(0, 2, 3, 1)
    H, W = x.shape[1], x.shape[2]
    pos = t64(params["pos_embed"])
    if pos.shape[:2] != (H, W):
        pos = F.interpolate(pos.permute(2, 0, 1)[None], size=(H, W),
                            mode="bicubic", align_corners=False
                            )[0].permute(1, 2, 0)
    x = x + pos
    for i, blk in enumerate(params["blocks"]):
        ws = 0 if i in cfg.global_blocks else cfg.window_size
        shortcut = x
        xn = ln(blk["norm1"], x)
        if ws:
            xw, pad_hw = window_partition(xn, ws)
            aw = torch_attention(blk["attn"], xw, cfg.num_heads)
            att = window_unpartition(aw, ws, pad_hw, (H, W))
        else:
            att = torch_attention(blk["attn"], xn, cfg.num_heads)
        x = shortcut + att
        xm = ln(blk["norm2"], x)
        x = x + lin(blk["mlp"]["proj"], F.gelu(lin(blk["mlp"]["fc"], xm)))
    n = params["neck"]
    x = F.conv2d(x.permute(0, 3, 1, 2),
                 t64(n["conv1"]["w"]).permute(3, 2, 0, 1)).permute(0, 2, 3, 1)
    x = ln(n["ln1"], x, eps=1e-6)
    x = F.conv2d(x.permute(0, 3, 1, 2),
                 t64(n["conv2"]["w"]).permute(3, 2, 0, 1),
                 padding=1).permute(0, 2, 3, 1)
    x = ln(n["ln2"], x, eps=1e-6)
    return x


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_vitdet_forward_matches_torch_oracle(rng):
    """vit_test on a 256px square: 16x16 tokens, window 6 pads to 18 (the
    pad path), block 2 runs global rel-pos attention at the full grid."""
    cfg = VITDET_CONFIGS["vit_test"]
    params = init_vitdet(jax.random.PRNGKey(3), cfg)
    img = rng.standard_normal((1, 256, 256, 3)).astype(np.float32)

    got = vitdet_forward(params, cfg, jnp.asarray(img))
    ref = torch_vitdet_forward(params, cfg, img)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_vitdet_rel_pos_interpolation_matches_torch(rng):
    """A stored rel-pos table of the WRONG length must be linearly
    interpolated exactly like F.interpolate (official get_rel_pos)."""
    from ovo_tpu.models.sam.vitdet import _rel_pos_table

    rel = rng.standard_normal((9, 8)).astype(np.float32)   # need 2*7-1 = 13
    got = _rel_pos_table(jnp.asarray(rel), 7)
    ref = get_rel_pos(7, 7, t64(rel))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_sam1_decoder_token_layout(rng):
    """The objectless decoder: iou head reads token 0, mask tokens 1..4;
    obj_score comes back all-zero; prompt gating still selects by
    predicted IoU and matches the ungated output restricted to the
    selection."""
    model = SAMModel.random_init("vit_test", image_size=256)
    assert "obj_score_token" not in model.params["decoder"]
    emb = jnp.asarray(rng.standard_normal((16, 16, 256)), jnp.float32)
    pts = jnp.asarray(rng.uniform(0.1, 0.9, (12, 2)), jnp.float32)

    out = model.decode_grid(emb, None, pts, mask_channels=(1, 2, 3))
    assert out["masks"].shape == (12, 3, 64, 64)
    assert out["iou"].shape == (12, 3)
    np.testing.assert_array_equal(np.asarray(out["obj_score"]),
                                  np.zeros(12, np.float32))

    gated = model.decode_grid(emb, None, pts, mask_channels=(1, 2, 3),
                              top_prompts=5)
    sel = np.asarray(gated["prompt_sel"])
    np.testing.assert_allclose(np.asarray(gated["masks"]),
                               np.asarray(out["masks"])[sel], atol=1e-5)


def test_sam1_preprocess_geometry():
    """ResizeLongestSide + pad: a 480x640 image lands in the top-left
    (192, 256) of the 256-square; the pad region is exactly zero; point
    scale maps [0,1] original coords into that box."""
    model = SAMModel.random_init("vit_test", image_size=256)
    assert model.resized_hw(480, 640) == (192, 256)
    sx, sy = model.point_scale(480, 640)
    assert (sx, sy) == (1.0, 0.75)

    img = jnp.ones((480, 640, 3), jnp.float32) * 0.5
    x = model.preprocess(img)
    assert x.shape == (1, 256, 256, 3)
    pad = np.asarray(x[0, 192:], np.float32)
    np.testing.assert_array_equal(pad, np.zeros_like(pad))
    body = np.asarray(x[0, :192, :256], np.float32)
    assert np.all(np.abs(body) > 0)        # normalized 0.5 is nonzero


def test_sam1_amg_end_to_end_nonsquare(rng):
    """Full AMG program on the SAM1 family: masks never extend into the
    pad region (suppressed logits + crop-composed upsample), outputs come
    back at the ORIGINAL image resolution."""
    from ovo_tpu.models.sam.amg import AutomaticMaskSource

    model = SAMModel.random_init("vit_test", image_size=256)
    amg = AutomaticMaskSource(model, points_per_side=4,
                              pred_iou_thresh=0.0, stability_thresh=0.0,
                              nms_score_th=0.0, max_masks=16,
                              candidates=32, gate_prompts=8)
    img = (rng.uniform(0, 255, (96, 128, 3))).astype(np.uint8)
    seg, bmaps, valid = amg.get_masks(img)
    assert seg.shape == (96, 128)
    assert bmaps.shape[1:] == (96, 128)
    assert np.asarray(valid).any()


def test_sam1_upsample_uses_raw_boundary_logits():
    """ADVICE r3 (medium): the pad-suppression sentinel must not feed the
    crop-composed upsample. Full-res rows near the crop edge interpolate
    across the valid/pad boundary at logit res, so a mask that is positive
    everywhere (including the model's real pad logits) must stay positive
    across the whole output -- the sentinel would drag the last rows to
    -inf-ish values."""
    from ovo_tpu.models.sam.amg import (_sam1_upsample_matrix,
                                        upsample_bilinear_matmul)

    Hm = Wm = 16
    s, nh, nw, out = 256, 192, 256, (96, 128)
    vh, vw = -(-nh * Hm // s), -(-nw * Wm // s)
    raw = jnp.ones((1, Hm, Wm), jnp.float32)       # positive everywhere
    row_ok = jnp.arange(Hm) < vh
    col_ok = jnp.arange(Wm) < vw
    suppressed = jnp.where(row_ok[None, :, None] & col_ok[None, None, :],
                           raw, -1e4)
    mats = (jnp.asarray(_sam1_upsample_matrix(Hm, s, nh, out[0])),
            jnp.asarray(_sam1_upsample_matrix(Wm, s, nw, out[1])))
    up_raw = np.asarray(upsample_bilinear_matmul(raw, out, mats=mats))
    up_sup = np.asarray(upsample_bilinear_matmul(suppressed, out, mats=mats))
    assert (up_raw > 0).all()                       # the fixed behavior
    assert (up_sup[:, -1, :] < 0).any()             # what the bug would do


def test_sam1_min_area_rescaled_to_logit_cells():
    """ADVICE r3 (low): min_area arrives in original-res pixels
    (reference min_mask_region_area = 100); the whole-mask gate compares
    logit-res cell counts, so the threshold must shrink by
    valid_cells/(out_h*out_w)."""
    from ovo_tpu.models.sam.amg import min_area_cells

    # SAM1 vit_h: 256x256 logits, valid 192x256 cells, 480x640 output:
    # one cell covers 480*640/(192*256) = 6.25 px -> 100 px == 16 cells
    assert min_area_cells(100, 192 * 256, (480, 640)) == 16.0
    # disabled gate stays disabled
    assert min_area_cells(0, 192 * 256, (480, 640)) == 0.0
    # SAM2 square path: 100 px at 1024^2 output with 256^2 logit cells
    assert min_area_cells(100, 256 * 256, (1024, 1024)) == 6.25


def test_sam1_factory_dispatch(tmp_path):
    """sam_version "" builds the SAM1 family with its reference defaults
    (stability 0.85, min_area 100) and the sam_<card>.pth filename."""
    from ovo_tpu.models.sam.amg import build_sam_mask_source

    src = build_sam_mask_source({
        "sam_version": "", "sam_encoder": "vit_test",
        "sam_ckpt_path": str(tmp_path), "image_size": 256,
        "points_per_side": 4})
    assert src.model.cfg.family == "sam1"
    assert src.stability_thresh == 0.85
    assert src.min_area == 100


# ---------------------------------------------------------------------------
# sam_vit_h_4b8939.pth manifest contract (mirrors test_convert_manifest.py)
# ---------------------------------------------------------------------------

def _vit_h_manifest():
    C, depth, heads, ff = 1280, 32, 16, 5120
    dh = C // heads
    m = {
        "image_encoder.pos_embed": (1, 64, 64, C),
        "image_encoder.patch_embed.proj.weight": (C, 3, 16, 16),
        "image_encoder.patch_embed.proj.bias": (C,),
        "image_encoder.neck.0.weight": (256, C, 1, 1),
        "image_encoder.neck.1.weight": (256,),
        "image_encoder.neck.1.bias": (256,),
        "image_encoder.neck.2.weight": (256, 256, 3, 3),
        "image_encoder.neck.3.weight": (256,),
        "image_encoder.neck.3.bias": (256,),
    }
    glob = (7, 15, 23, 31)
    for i in range(depth):
        p = f"image_encoder.blocks.{i}"
        span = 64 if i in glob else 14
        m.update({
            f"{p}.norm1.weight": (C,), f"{p}.norm1.bias": (C,),
            f"{p}.attn.qkv.weight": (3 * C, C),
            f"{p}.attn.qkv.bias": (3 * C,),
            f"{p}.attn.proj.weight": (C, C), f"{p}.attn.proj.bias": (C,),
            f"{p}.attn.rel_pos_h": (2 * span - 1, dh),
            f"{p}.attn.rel_pos_w": (2 * span - 1, dh),
            f"{p}.norm2.weight": (C,), f"{p}.norm2.bias": (C,),
            f"{p}.mlp.lin1.weight": (ff, C), f"{p}.mlp.lin1.bias": (ff,),
            f"{p}.mlp.lin2.weight": (C, ff), f"{p}.mlp.lin2.bias": (C,),
        })
    # prompt encoder
    m.update({
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix":
            (2, 128),
        "prompt_encoder.not_a_point_embed.weight": (1, 256),
        "prompt_encoder.no_mask_embed.weight": (1, 256),
    })
    for i in range(4):
        m[f"prompt_encoder.point_embeddings.{i}.weight"] = (1, 256)
    # mask-prompt downscaler (UNUSED by the AMG path -- documented ignore)
    m.update({
        "prompt_encoder.mask_downscaling.0.weight": (4, 1, 2, 2),
        "prompt_encoder.mask_downscaling.0.bias": (4,),
        "prompt_encoder.mask_downscaling.1.weight": (4,),
        "prompt_encoder.mask_downscaling.1.bias": (4,),
        "prompt_encoder.mask_downscaling.3.weight": (16, 4, 2, 2),
        "prompt_encoder.mask_downscaling.3.bias": (16,),
        "prompt_encoder.mask_downscaling.4.weight": (16,),
        "prompt_encoder.mask_downscaling.4.bias": (16,),
        "prompt_encoder.mask_downscaling.6.weight": (256, 16, 1, 1),
        "prompt_encoder.mask_downscaling.6.bias": (256,),
    })
    # mask decoder (two-way transformer depth 2, internal 128 cross attn)
    d = 256
    for i in range(2):
        p = f"mask_decoder.transformer.layers.{i}"
        for attn, internal in (("self_attn", d),
                               ("cross_attn_token_to_image", d // 2),
                               ("cross_attn_image_to_token", d // 2)):
            m.update({
                f"{p}.{attn}.q_proj.weight": (internal, d),
                f"{p}.{attn}.q_proj.bias": (internal,),
                f"{p}.{attn}.k_proj.weight": (internal, d),
                f"{p}.{attn}.k_proj.bias": (internal,),
                f"{p}.{attn}.v_proj.weight": (internal, d),
                f"{p}.{attn}.v_proj.bias": (internal,),
                f"{p}.{attn}.out_proj.weight": (d, internal),
                f"{p}.{attn}.out_proj.bias": (d,),
            })
        for nrm in ("norm1", "norm2", "norm3", "norm4"):
            m[f"{p}.{nrm}.weight"] = (d,)
            m[f"{p}.{nrm}.bias"] = (d,)
        m.update({f"{p}.mlp.lin1.weight": (2048, d),
                  f"{p}.mlp.lin1.bias": (2048,),
                  f"{p}.mlp.lin2.weight": (d, 2048),
                  f"{p}.mlp.lin2.bias": (d,)})
    fa = "mask_decoder.transformer.final_attn_token_to_image"
    m.update({
        f"{fa}.q_proj.weight": (128, d), f"{fa}.q_proj.bias": (128,),
        f"{fa}.k_proj.weight": (128, d), f"{fa}.k_proj.bias": (128,),
        f"{fa}.v_proj.weight": (128, d), f"{fa}.v_proj.bias": (128,),
        f"{fa}.out_proj.weight": (d, 128), f"{fa}.out_proj.bias": (d,),
        "mask_decoder.transformer.norm_final_attn.weight": (d,),
        "mask_decoder.transformer.norm_final_attn.bias": (d,),
        "mask_decoder.iou_token.weight": (1, d),
        "mask_decoder.mask_tokens.weight": (4, d),
        "mask_decoder.output_upscaling.0.weight": (d, 64, 2, 2),
        "mask_decoder.output_upscaling.0.bias": (64,),
        "mask_decoder.output_upscaling.1.weight": (64,),
        "mask_decoder.output_upscaling.1.bias": (64,),
        "mask_decoder.output_upscaling.3.weight": (64, 32, 2, 2),
        "mask_decoder.output_upscaling.3.bias": (32,),
    })
    for i in range(4):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        m.update({f"{p}.layers.0.weight": (d, d), f"{p}.layers.0.bias": (d,),
                  f"{p}.layers.1.weight": (d, d), f"{p}.layers.1.bias": (d,),
                  f"{p}.layers.2.weight": (32, d),
                  f"{p}.layers.2.bias": (32,)})
    p = "mask_decoder.iou_prediction_head"
    m.update({f"{p}.layers.0.weight": (d, d), f"{p}.layers.0.bias": (d,),
              f"{p}.layers.1.weight": (d, d), f"{p}.layers.1.bias": (d,),
              f"{p}.layers.2.weight": (4, d), f"{p}.layers.2.bias": (4,)})
    return m


def test_sam1_vit_h_manifest_contract():
    """Zero-filled sam_vit_h state dict -> converter consumes every key
    outside the documented ignore set and emits a tree matching
    SAMModel.random_init("vit_h") in structure + shapes."""
    from ovo_tpu.models.convert_sam import (convert_mask_decoder,
                                            convert_prompt_encoder,
                                            convert_sam_state_dict,
                                            convert_vitdet)
    from test_convert_manifest import tree_shapes, zeros_sd

    manifest = _vit_h_manifest()
    # consumption tracking on the sub-converters (convert_sam_state_dict
    # rebuilds the dict for module.-prefix stripping, which would drop the
    # tracking wrapper)
    sd = zeros_sd(manifest)
    params = {
        "trunk": convert_vitdet(sd),
        "prompt": convert_prompt_encoder(sd, prefix="prompt_encoder"),
        "decoder": convert_mask_decoder(sd, prefix="mask_decoder",
                                        obj_token=False),
    }
    ignore = {k for k in manifest
              if k.startswith("prompt_encoder.mask_downscaling.")}
    missed = set(manifest) - sd.touched - ignore
    assert not missed, f"converter silently skipped: {sorted(missed)[:8]}"

    ref = SAMModel.random_init("vit_h").params
    got_shapes = tree_shapes(params)
    ref_shapes = tree_shapes(jax.tree_util.tree_map(np.asarray, ref))
    assert got_shapes == ref_shapes

    # the public dispatcher must route this layout to the same tree
    disp = convert_sam_state_dict(dict(sd))
    assert tree_shapes(disp) == got_shapes

"""SAM1 ViT-det image encoder cross-IMPLEMENTATION parity vs HuggingFace
transformers' SamVisionModel: the same random official-format
(segment_anything) state dict loads through our converter + JAX forward
and through transformers' independent SAM port. Agreement pins the
windowed-attention partitioning, the decomposed relative-position bias,
and the LayerNorm2d neck against foreign code.

Reference consumption path: SAM1 via sam_model_registry at
/root/reference/ovo/utils/segment_utils.py:269-309.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

C, DEPTH, HEADS, MLP = 32, 3, 2, 128
IMG, PATCH, WS = 96, 16, 6            # grid 6 == window 6 on both sides
OUT = 64
GLOBAL = (2,)


def official_sam1_encoder_sd(rng):
    def t(*shape):
        return torch.from_numpy(
            (rng.standard_normal(shape) * 0.08).astype(np.float32))

    g, dh = IMG // PATCH, C // HEADS
    m = {"image_encoder.pos_embed": t(1, g, g, C),
         "image_encoder.patch_embed.proj.weight": t(C, 3, PATCH, PATCH),
         "image_encoder.patch_embed.proj.bias": t(C)}
    for i in range(DEPTH):
        p = f"image_encoder.blocks.{i}"
        m[f"{p}.norm1.weight"] = 1 + 0.1 * t(C)
        m[f"{p}.norm1.bias"] = t(C)
        m[f"{p}.attn.qkv.weight"] = t(3 * C, C)
        m[f"{p}.attn.qkv.bias"] = t(3 * C)
        m[f"{p}.attn.proj.weight"] = t(C, C)
        m[f"{p}.attn.proj.bias"] = t(C)
        span = g if i in GLOBAL else WS
        m[f"{p}.attn.rel_pos_h"] = t(2 * span - 1, dh)
        m[f"{p}.attn.rel_pos_w"] = t(2 * span - 1, dh)
        m[f"{p}.norm2.weight"] = 1 + 0.1 * t(C)
        m[f"{p}.norm2.bias"] = t(C)
        m[f"{p}.mlp.lin1.weight"] = t(MLP, C)
        m[f"{p}.mlp.lin1.bias"] = t(MLP)
        m[f"{p}.mlp.lin2.weight"] = t(C, MLP)
        m[f"{p}.mlp.lin2.bias"] = t(C)
    m["image_encoder.neck.0.weight"] = t(OUT, C, 1, 1)
    m["image_encoder.neck.1.weight"] = 1 + 0.1 * t(OUT)
    m["image_encoder.neck.1.bias"] = t(OUT)
    m["image_encoder.neck.2.weight"] = t(OUT, OUT, 3, 3)
    m["image_encoder.neck.3.weight"] = 1 + 0.1 * t(OUT)
    m["image_encoder.neck.3.bias"] = t(OUT)
    return m


def to_hf_state_dict(sd):
    ren = {"image_encoder.pos_embed": "vision_encoder.pos_embed",
           "image_encoder.patch_embed.proj.weight":
               "vision_encoder.patch_embed.projection.weight",
           "image_encoder.patch_embed.proj.bias":
               "vision_encoder.patch_embed.projection.bias"}
    for i in range(DEPTH):
        o, h = f"image_encoder.blocks.{i}", f"vision_encoder.layers.{i}"
        ren[f"{o}.norm1.weight"] = f"{h}.layer_norm1.weight"
        ren[f"{o}.norm1.bias"] = f"{h}.layer_norm1.bias"
        ren[f"{o}.norm2.weight"] = f"{h}.layer_norm2.weight"
        ren[f"{o}.norm2.bias"] = f"{h}.layer_norm2.bias"
        for k in ("attn.qkv.weight", "attn.qkv.bias", "attn.proj.weight",
                  "attn.proj.bias", "attn.rel_pos_h", "attn.rel_pos_w",
                  "mlp.lin1.weight", "mlp.lin1.bias", "mlp.lin2.weight",
                  "mlp.lin2.bias"):
            ren[f"{o}.{k}"] = f"{h}.{k}"
    for o, h in (("neck.0.weight", "neck.conv1.weight"),
                 ("neck.1.weight", "neck.layer_norm1.weight"),
                 ("neck.1.bias", "neck.layer_norm1.bias"),
                 ("neck.2.weight", "neck.conv2.weight"),
                 ("neck.3.weight", "neck.layer_norm2.weight"),
                 ("neck.3.bias", "neck.layer_norm2.bias")):
        ren[f"image_encoder.{o}"] = f"vision_encoder.{h}"
    return {ren[k]: v for k, v in sd.items()}


def test_sam1_encoder_matches_transformers():
    import jax.numpy as jnp

    from ovo_tpu.models import convert_sam
    from ovo_tpu.models.sam.vitdet import ViTDetConfig, vitdet_forward

    rng = np.random.default_rng(2)
    sd = official_sam1_encoder_sd(rng)

    params = jax_tree(convert_sam.convert_vitdet(sd))
    cfg = ViTDetConfig(embed_dim=C, depth=DEPTH, num_heads=HEADS,
                       global_blocks=GLOBAL, window_size=WS, patch=PATCH,
                       mlp_ratio=MLP / C, out_chans=OUT,
                       pretrain_grid=IMG // PATCH)
    imgs = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32) * 0.5
    ours = np.asarray(vitdet_forward(params, cfg, jnp.asarray(imgs)))

    from transformers import SamVisionConfig, SamVisionModel

    hf_cfg = SamVisionConfig(
        hidden_size=C, output_channels=OUT, num_hidden_layers=DEPTH,
        num_attention_heads=HEADS, image_size=IMG, patch_size=PATCH,
        use_rel_pos=True, window_size=WS,
        global_attn_indexes=list(GLOBAL), mlp_dim=MLP,
        attention_dropout=0.0)
    model = SamVisionModel(hf_cfg).eval()
    missing, unexpected = model.load_state_dict(to_hf_state_dict(sd),
                                                strict=True)
    assert not missing and not unexpected
    with torch.no_grad():
        theirs = model(pixel_values=torch.from_numpy(
            imgs.transpose(0, 3, 1, 2))).last_hidden_state.numpy()

    # ours: (B, h, w, OUT) channels-last vs HF (B, OUT, h, w)
    theirs = theirs.transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def jax_tree(params):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, params)

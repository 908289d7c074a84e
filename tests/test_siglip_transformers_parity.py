"""SigLIP vision tower cross-IMPLEMENTATION parity: our timm-format
converter + JAX forward vs HuggingFace transformers' SiglipVisionModel --
an independent third-party implementation of the same architecture
(patch conv + pos embed, pre-LN blocks, post-LN, MAP attention-pool head
with residual MLP). The r1-r4 oracles were torch modules written HERE to
the official forward; transformers is foreign code, so agreement pins the
converter's key/layout mapping (qkv splits, MAP head in_proj packing) and
the forward semantics against a second implementation.

Reference consumption path: open_clip SigLIP cards at
/root/reference/ovo/utils/clip_utils.py:51-86.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

W_, DEPTH, HEADS, HIDDEN = 64, 2, 4, 128
IMG, PATCH = 56, 14          # 4x4 = 16 tokens


def timm_siglip_vision_sd(rng):
    """Random timm/open_clip-format vision state dict (the
    siglip_so400m_384_manifest structure at tiny dims)."""
    def t(*shape):
        return torch.from_numpy(
            (rng.standard_normal(shape) * 0.08).astype(np.float32))

    m = {}
    p = "visual.trunk"
    m[f"{p}.patch_embed.proj.weight"] = t(W_, 3, PATCH, PATCH)
    m[f"{p}.patch_embed.proj.bias"] = t(W_)
    m[f"{p}.pos_embed"] = t(1, (IMG // PATCH) ** 2, W_)
    for i in range(DEPTH):
        b = f"{p}.blocks.{i}"
        m[f"{b}.norm1.weight"] = 1 + 0.1 * t(W_)
        m[f"{b}.norm1.bias"] = t(W_)
        m[f"{b}.attn.qkv.weight"] = t(3 * W_, W_)
        m[f"{b}.attn.qkv.bias"] = t(3 * W_)
        m[f"{b}.attn.proj.weight"] = t(W_, W_)
        m[f"{b}.attn.proj.bias"] = t(W_)
        m[f"{b}.norm2.weight"] = 1 + 0.1 * t(W_)
        m[f"{b}.norm2.bias"] = t(W_)
        m[f"{b}.mlp.fc1.weight"] = t(HIDDEN, W_)
        m[f"{b}.mlp.fc1.bias"] = t(HIDDEN)
        m[f"{b}.mlp.fc2.weight"] = t(W_, HIDDEN)
        m[f"{b}.mlp.fc2.bias"] = t(W_)
    m[f"{p}.norm.weight"] = 1 + 0.1 * t(W_)
    m[f"{p}.norm.bias"] = t(W_)
    ap = f"{p}.attn_pool"
    m[f"{ap}.latent"] = t(1, 1, W_)
    m[f"{ap}.q.weight"] = t(W_, W_)
    m[f"{ap}.q.bias"] = t(W_)
    m[f"{ap}.kv.weight"] = t(2 * W_, W_)
    m[f"{ap}.kv.bias"] = t(2 * W_)
    m[f"{ap}.proj.weight"] = t(W_, W_)
    m[f"{ap}.proj.bias"] = t(W_)
    m[f"{ap}.norm.weight"] = 1 + 0.1 * t(W_)
    m[f"{ap}.norm.bias"] = t(W_)
    m[f"{ap}.mlp.fc1.weight"] = t(HIDDEN, W_)
    m[f"{ap}.mlp.fc1.bias"] = t(HIDDEN)
    m[f"{ap}.mlp.fc2.weight"] = t(W_, HIDDEN)
    m[f"{ap}.mlp.fc2.bias"] = t(W_)
    return m


def to_hf_state_dict(sd):
    """timm/open_clip keys -> transformers SiglipVisionModel keys."""
    p, out = "visual.trunk", {}
    v = "vision_model"
    out[f"{v}.embeddings.patch_embedding.weight"] = \
        sd[f"{p}.patch_embed.proj.weight"]
    out[f"{v}.embeddings.patch_embedding.bias"] = \
        sd[f"{p}.patch_embed.proj.bias"]
    out[f"{v}.embeddings.position_embedding.weight"] = \
        sd[f"{p}.pos_embed"][0]
    for i in range(DEPTH):
        b, hl = f"{p}.blocks.{i}", f"{v}.encoder.layers.{i}"
        qkv_w = sd[f"{b}.attn.qkv.weight"]
        qkv_b = sd[f"{b}.attn.qkv.bias"]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            out[f"{hl}.self_attn.{name}.weight"] = \
                qkv_w[j * W_:(j + 1) * W_]
            out[f"{hl}.self_attn.{name}.bias"] = qkv_b[j * W_:(j + 1) * W_]
        out[f"{hl}.self_attn.out_proj.weight"] = sd[f"{b}.attn.proj.weight"]
        out[f"{hl}.self_attn.out_proj.bias"] = sd[f"{b}.attn.proj.bias"]
        for a, bkey in (("layer_norm1", "norm1"), ("layer_norm2", "norm2")):
            out[f"{hl}.{a}.weight"] = sd[f"{b}.{bkey}.weight"]
            out[f"{hl}.{a}.bias"] = sd[f"{b}.{bkey}.bias"]
        for fc in ("fc1", "fc2"):
            out[f"{hl}.mlp.{fc}.weight"] = sd[f"{b}.mlp.{fc}.weight"]
            out[f"{hl}.mlp.{fc}.bias"] = sd[f"{b}.mlp.{fc}.bias"]
    out[f"{v}.post_layernorm.weight"] = sd[f"{p}.norm.weight"]
    out[f"{v}.post_layernorm.bias"] = sd[f"{p}.norm.bias"]
    ap, h = f"{p}.attn_pool", f"{v}.head"
    out[f"{h}.probe"] = sd[f"{ap}.latent"]
    # nn.MultiheadAttention packs in_proj rows as [q; k; v] == [q; kv]
    out[f"{h}.attention.in_proj_weight"] = torch.cat(
        [sd[f"{ap}.q.weight"], sd[f"{ap}.kv.weight"]], dim=0)
    out[f"{h}.attention.in_proj_bias"] = torch.cat(
        [sd[f"{ap}.q.bias"], sd[f"{ap}.kv.bias"]], dim=0)
    out[f"{h}.attention.out_proj.weight"] = sd[f"{ap}.proj.weight"]
    out[f"{h}.attention.out_proj.bias"] = sd[f"{ap}.proj.bias"]
    out[f"{h}.layernorm.weight"] = sd[f"{ap}.norm.weight"]
    out[f"{h}.layernorm.bias"] = sd[f"{ap}.norm.bias"]
    for fc in ("fc1", "fc2"):
        out[f"{h}.mlp.{fc}.weight"] = sd[f"{ap}.mlp.{fc}.weight"]
        out[f"{h}.mlp.{fc}.bias"] = sd[f"{ap}.mlp.{fc}.bias"]
    return out


def test_siglip_vision_tower_matches_transformers():
    import jax.numpy as jnp

    from ovo_tpu.models import convert, vit as vit_mod
    from ovo_tpu.models.vit import ViTConfig

    rng = np.random.default_rng(0)
    sd = timm_siglip_vision_sd(rng)

    # ours: timm converter -> JAX forward (f32)
    params = convert.convert_timm_trunk(sd, prefix="visual.trunk")
    cfg = ViTConfig(image_size=IMG, patch_size=PATCH, width=W_, depth=DEPTH,
                    n_heads=HEADS, mlp_ratio=HIDDEN / W_, embed_dim=W_,
                    use_cls_token=False, use_abs_pos=True, pool="attn")
    imgs = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32) * 0.5
    ours = np.asarray(vit_mod.encode(
        params, cfg, jnp.asarray(imgs), project=False))

    # theirs: transformers SiglipVisionModel with the SAME tensors
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=W_, intermediate_size=HIDDEN,
        num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        image_size=IMG, patch_size=PATCH, hidden_act="gelu",
        attention_dropout=0.0)
    model = SiglipVisionModel(hf_cfg).eval()
    missing, unexpected = model.load_state_dict(to_hf_state_dict(sd),
                                                strict=True)
    assert not missing and not unexpected
    with torch.no_grad():
        theirs = model(pixel_values=torch.from_numpy(
            imgs.transpose(0, 3, 1, 2))).pooler_output.numpy()

    assert ours.shape == theirs.shape == (2, W_)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

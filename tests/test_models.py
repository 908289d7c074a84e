"""Model towers: shapes, conversion parity vs torch reference modules,
TextRegion structural behavior, merger training."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from ovo_tpu.models import convert, layers as L, text as text_mod, vit as vit_mod
from ovo_tpu.models.clip import CLIPModel, MODEL_REGISTRY
from ovo_tpu.models.merger import (init_merger, LearnedMerger, make_train_step,
                                   merger_apply, merger_loss)
from ovo_tpu.models.textregion import TextRegionEmbedder
from ovo_tpu.models.tokenizers import HashTokenizer


# ---------------------------------------------------------------------------
# torch reference block (CLIP residual attention block) for conversion parity
# ---------------------------------------------------------------------------

class TorchCLIPBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, h, batch_first=True)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.c_fc = nn.Linear(d, 4 * d)
        self.mlp.c_proj = nn.Linear(4 * d, d)

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False)
        x = x + y
        y = self.ln_2(x)
        x = x + self.mlp.c_proj(nn.functional.gelu(self.mlp.c_fc(y)))
        return x


def test_block_conversion_matches_torch(rng):
    torch.manual_seed(0)
    d, h, b, l = 32, 4, 2, 10
    blk = TorchCLIPBlock(d, h).eval()
    x = torch.randn(b, l, d)
    with torch.no_grad():
        ref = blk(x).numpy()
    sd = {f"blk.{k}": v for k, v in blk.state_dict().items()}
    params = convert.convert_clip_block(sd, "blk")
    params = jax.tree_util.tree_map(jnp.asarray, params)
    got = L.transformer_block(params, jnp.asarray(x.numpy()), h,
                              attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_attn_pool_conversion_matches_torch(rng):
    """PE attn_pool: probe + LN + MultiheadAttention, constant-k TextRegion
    call pattern (textregion.py:183-187)."""
    torch.manual_seed(1)
    d, h, l, m = 32, 4, 20, 3

    class Pool(nn.Module):
        def __init__(self):
            super().__init__()
            self.probe = nn.Parameter(torch.randn(1, 1, d))
            self.layernorm = nn.LayerNorm(d)
            self.attn = nn.MultiheadAttention(d, h, batch_first=True)

    pool = Pool().eval()
    x = torch.randn(m, l, d)
    key_mask = torch.rand(m, l) > 0.4
    key_mask[:, 0] = False  # False = attend (torch key_padding_mask=True -> ignore)
    with torch.no_grad():
        q = pool.probe.repeat(m, 1, 1)
        k = pool.layernorm(x.mean(dim=-2, keepdim=True)).repeat(1, l, 1)
        ref, _ = pool.attn(q, k, x, need_weights=False,
                           key_padding_mask=key_mask)
        ref = ref.squeeze(1).numpy()

    sd = {f"p.{k}": v for k, v in pool.state_dict().items()}
    jp = jax.tree_util.tree_map(jnp.asarray, convert.convert_attn_pool(sd, "p"))

    from ovo_tpu.ops.masked_pool import xla_masked_single_query_attention

    xs = jnp.asarray(x.numpy())
    kin = L.layer_norm(jp["ln"], jnp.mean(xs, axis=1, keepdims=True))
    hd = d // h
    outs = []
    for i in range(m):
        qh = L.linear(jp["q"], jp["probe"]).reshape(1, h, hd)
        kh = jnp.broadcast_to(
            L.linear(jp["k"], kin[i]).reshape(h, 1, hd), (h, l, hd))
        vh = L.linear(jp["v"], xs[i]).reshape(l, h, hd).transpose(1, 0, 2)
        o = xla_masked_single_query_attention(
            qh, kh, vh, ~jnp.asarray(key_mask.numpy())[i:i + 1])
        outs.append(L.linear(jp["out"], o.reshape(1, d)))
    got = jnp.concatenate(outs)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_text_tower_conversion_matches_torch_linears(rng):
    # spot-check the text tower param mapping shapes
    d, v, ctx = 16, 100, 8
    sd = {
        "token_embedding.weight": torch.randn(v, d),
        "positional_embedding": torch.randn(ctx, d),
        "ln_final.weight": torch.ones(d), "ln_final.bias": torch.zeros(d),
        "text_projection": torch.randn(d, 12),
    }
    blk = TorchCLIPBlock(d, 4)
    sd.update({f"transformer.resblocks.0.{k}": v_
               for k, v_ in blk.state_dict().items()})
    p = convert.convert_text_tower(sd)
    assert p["tok_embed"].shape == (v, d)
    assert p["proj"].shape == (d, 12)
    assert len(p["blocks"]) == 1


def test_vit_forward_shapes():
    cfg = MODEL_REGISTRY["tiny-test"].vision
    params = vit_mod.init_vit(jax.random.PRNGKey(0), cfg)
    imgs = jnp.zeros((2, 64, 64, 3))
    tokens = vit_mod.forward_features(params, cfg, imgs)
    assert tokens.shape == (2, 1 + 16, 64)
    emb = vit_mod.encode(params, cfg, imgs)
    assert emb.shape == (2, 32)


def test_vit_pos_embed_interpolation():
    cfg = MODEL_REGISTRY["tiny-test"].vision
    params = vit_mod.init_vit(jax.random.PRNGKey(0), cfg)
    imgs = jnp.zeros((1, 96, 96, 3))  # 6x6 grid vs trained 4x4
    tokens = vit_mod.forward_features(params, cfg, imgs)
    assert tokens.shape == (1, 1 + 36, 64)


def test_clip_model_text_and_similarity():
    model = CLIPModel.random_init("tiny-test")
    txt = model.encode_text(["a chair", "a table"])
    assert txt.shape == (2, 32)
    img = model.encode_image(jnp.zeros((3, 64, 64, 3)))
    sim = model.similarity(txt, img)
    assert sim.shape == (3, 2)


def test_textregion_embedder_structure(rng):
    model = CLIPModel.random_init("tiny-test")
    emb = TextRegionEmbedder(model, resize_method="multi_resolution")
    image = (rng.random((128, 160, 3)) * 255).astype(np.uint8)
    masks = np.zeros((4, 128, 160), bool)
    masks[0, :40, :40] = True
    masks[1, 60:120, 80:150] = True
    masks[2, 20:80, 60:100] = True
    out = np.asarray(emb.embed_masks(image, masks, np.ones(4, bool)))
    assert out.shape == (4, 32)
    norms = np.linalg.norm(out[:3], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # disjoint masks over random features -> different embeddings
    assert np.abs(out[0] - out[1]).max() > 1e-4


def test_merger_softmax_convexity(rng):
    params = init_merger(jax.random.PRNGKey(0), d_model=32, depth=2,
                         n_heads=4, mlp_hidden=16)
    clips = jnp.asarray(rng.standard_normal((5, 3, 32)), jnp.float32)
    fused = merger_apply(params, clips, n_heads=4)
    assert fused.shape == (5, 32)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(fused, axis=-1)),
                               1.0, atol=1e-5)


def test_merger_training_reduces_loss(rng):
    import optax

    params = init_merger(jax.random.PRNGKey(0), d_model=16, depth=1,
                         n_heads=2, mlp_hidden=8)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(opt)
    clips = jnp.asarray(rng.standard_normal((32, 3, 16)), jnp.float32)
    target = clips[:, 1]  # learn to pick the middle clip
    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, clips, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_merger_conversion_from_torch():
    torch.manual_seed(0)
    d = 16
    enc_layer = nn.TransformerEncoderLayer(d, 2, dim_feedforward=4 * d,
                                           batch_first=True)
    enc = nn.TransformerEncoder(enc_layer, num_layers=2)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = enc
            self.fc1 = nn.Linear(d, 8)
            self.out = nn.Linear(8, 1)

    m = M()
    p = convert.convert_merger_state_dict(m.state_dict())
    assert len(p["blocks"]) == 2
    assert p["head"]["fc"]["w"].shape == (d, 8)
    assert p["head"]["proj"]["w"].shape == (8, 1)


def test_textregion_batch_matches_single(rng):
    from ovo_tpu.models.textregion import TextRegionEmbedder

    model = CLIPModel.random_init("tiny-test")
    emb = TextRegionEmbedder(model, resize_method="multi_resolution")
    images = (rng.random((2, 128, 160, 3)) * 255).astype(np.uint8)
    masks = np.zeros((2, 4, 128, 160), bool)
    masks[0, 0, :40, :40] = True
    masks[0, 1, 60:120, 80:150] = True
    masks[1, 0, 10:50, 20:90] = True
    masks[1, 2, 70:110, 100:140] = True
    valid = np.ones((2, 4), bool)
    out_b = np.asarray(emb.embed_masks_batch(images, masks, valid))
    for j in range(2):
        out = np.asarray(emb.embed_masks(images[j], masks[j], valid[j]))
        np.testing.assert_allclose(out_b[j], out, atol=2e-5)


ZOO_CARDS = [c for c in MODEL_REGISTRY
             if c not in ("tiny-test", "PE-Core-L-14-336")]  # alias


@pytest.mark.parametrize("card", ZOO_CARDS)
def test_zoo_card_traces_to_correct_dims(card):
    """Every reference model card (clip_utils.py:51-86) random-inits and
    traces a full vision+text forward to its published clip_dim, without
    materializing the (possibly huge) parameter arrays (jax.eval_shape)."""
    cfg = MODEL_REGISTRY[card]

    def build_and_run(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        vp = vit_mod.init_vit(k1, cfg.vision)
        tp = text_mod.init_text(k2, cfg.text)
        img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3),
                        jnp.float32)
        tok = jnp.zeros((2, cfg.text.context_length), jnp.int32)
        return (vit_mod.encode(vp, cfg.vision, img),
                text_mod.encode_text(tp, cfg.text, tok))

    vi, tx = jax.eval_shape(build_and_run, jnp.asarray(0, jnp.uint32))
    assert vi.shape == (1, cfg.clip_dim), (card, vi.shape)
    assert tx.shape == (2, cfg.clip_dim), (card, tx.shape)


def test_quick_gelu_card_numeric_forward(rng):
    """The smallest DFN card runs a real random-init forward; quick-gelu
    actually changes the activation path vs exact gelu."""
    m = CLIPModel.random_init("ViT-B-16-qg")
    img = jnp.asarray(rng.random((1, 224, 224, 3)), jnp.float32)
    emb = m.encode_image(img)
    assert emb.shape == (1, 512) and np.isfinite(np.asarray(emb)).all()
    txt = m.encode_text(["a chair", "a table"])
    assert txt.shape == (2, 512) and np.isfinite(np.asarray(txt)).all()

    x = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    qg = np.asarray(L.quick_gelu(x))
    torch_qg = (torch.from_numpy(np.asarray(x))
                * torch.sigmoid(1.702 * torch.from_numpy(np.asarray(x))))
    np.testing.assert_allclose(qg, torch_qg.numpy(), rtol=1e-6, atol=1e-6)
    assert np.abs(qg - np.asarray(L.gelu(x))).max() > 1e-3


def test_timm_trunk_conversion_roundtrip(rng):
    """A fabricated timm-naming SigLIP-style state dict converts to a tree
    our ViT runs; the MAP head's kv split and residual MLP land correctly."""
    W, p, img, depth, heads = 64, 16, 64, 2, 4
    g = torch.Generator().manual_seed(0)
    sd = {}
    def t(*shape): return torch.randn(*shape, generator=g) * 0.02
    pre = "visual.trunk"
    sd[f"{pre}.patch_embed.proj.weight"] = t(W, 3, p, p)
    sd[f"{pre}.patch_embed.proj.bias"] = t(W)
    sd[f"{pre}.pos_embed"] = t(1, (img // p) ** 2, W)
    for i in range(depth):
        b = f"{pre}.blocks.{i}"
        sd[f"{b}.norm1.weight"] = t(W); sd[f"{b}.norm1.bias"] = t(W)
        sd[f"{b}.attn.qkv.weight"] = t(3 * W, W)
        sd[f"{b}.attn.qkv.bias"] = t(3 * W)
        sd[f"{b}.attn.proj.weight"] = t(W, W)
        sd[f"{b}.attn.proj.bias"] = t(W)
        sd[f"{b}.norm2.weight"] = t(W); sd[f"{b}.norm2.bias"] = t(W)
        sd[f"{b}.mlp.fc1.weight"] = t(4 * W, W)
        sd[f"{b}.mlp.fc1.bias"] = t(4 * W)
        sd[f"{b}.mlp.fc2.weight"] = t(W, 4 * W)
        sd[f"{b}.mlp.fc2.bias"] = t(W)
    sd[f"{pre}.norm.weight"] = t(W); sd[f"{pre}.norm.bias"] = t(W)
    ap = f"{pre}.attn_pool"
    sd[f"{ap}.latent"] = t(1, 1, W)
    sd[f"{ap}.q.weight"] = t(W, W); sd[f"{ap}.q.bias"] = t(W)
    sd[f"{ap}.kv.weight"] = t(2 * W, W); sd[f"{ap}.kv.bias"] = t(2 * W)
    sd[f"{ap}.proj.weight"] = t(W, W); sd[f"{ap}.proj.bias"] = t(W)
    sd[f"{ap}.norm.weight"] = t(W); sd[f"{ap}.norm.bias"] = t(W)
    sd[f"{ap}.mlp.fc1.weight"] = t(4 * W, W); sd[f"{ap}.mlp.fc1.bias"] = t(4 * W)
    sd[f"{ap}.mlp.fc2.weight"] = t(W, 4 * W); sd[f"{ap}.mlp.fc2.bias"] = t(W)

    params = convert.convert_timm_trunk(sd)
    assert params["attn_pool"]["ln"] is None
    assert "mlp" in params["attn_pool"]
    # kv split: k rows then v rows
    np.testing.assert_allclose(
        params["attn_pool"]["k"]["w"],
        sd[f"{ap}.kv.weight"][:W].numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        params["attn_pool"]["v"]["w"],
        sd[f"{ap}.kv.weight"][W:].numpy().T, rtol=1e-6)

    from ovo_tpu.models.vit import ViTConfig
    cfg = ViTConfig(image_size=img, patch_size=p, width=W, depth=depth,
                    n_heads=heads, embed_dim=W, use_cls_token=False,
                    use_abs_pos=True, pool="attn")
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, params)
    x = jnp.asarray(rng.random((1, img, img, 3)), jnp.float32)
    out = vit_mod.encode(params, cfg, x)
    assert out.shape == (1, W) and np.isfinite(np.asarray(out)).all()

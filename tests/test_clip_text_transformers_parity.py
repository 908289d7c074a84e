"""CLIP text tower cross-IMPLEMENTATION parity vs HuggingFace
transformers' CLIPTextModelWithProjection: the same random openai-format
state dict (token/positional embeddings, causal pre-LN resblocks with
packed in_proj qkv, quick_gelu, ln_final, argmax-EOT pooling, raw
text_projection matrix) loads through our converter + JAX forward and
through transformers' independent implementation.

Reference consumption path: open_clip text towers at
/root/reference/ovo/entities/clip_generator.py:160-199.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

W_, DEPTH, HEADS, HIDDEN = 64, 2, 4, 128
VOCAB, CTX, EMBED = 99, 16, 48


def openai_text_sd(rng):
    def t(*shape):
        return torch.from_numpy(
            (rng.standard_normal(shape) * 0.08).astype(np.float32))

    m = {"token_embedding.weight": t(VOCAB, W_),
         "positional_embedding": t(CTX, W_)}
    for i in range(DEPTH):
        p = f"transformer.resblocks.{i}"
        m[f"{p}.ln_1.weight"] = 1 + 0.1 * t(W_)
        m[f"{p}.ln_1.bias"] = t(W_)
        m[f"{p}.attn.in_proj_weight"] = t(3 * W_, W_)
        m[f"{p}.attn.in_proj_bias"] = t(3 * W_)
        m[f"{p}.attn.out_proj.weight"] = t(W_, W_)
        m[f"{p}.attn.out_proj.bias"] = t(W_)
        m[f"{p}.ln_2.weight"] = 1 + 0.1 * t(W_)
        m[f"{p}.ln_2.bias"] = t(W_)
        m[f"{p}.mlp.c_fc.weight"] = t(HIDDEN, W_)
        m[f"{p}.mlp.c_fc.bias"] = t(HIDDEN)
        m[f"{p}.mlp.c_proj.weight"] = t(W_, HIDDEN)
        m[f"{p}.mlp.c_proj.bias"] = t(W_)
    m["ln_final.weight"] = 1 + 0.1 * t(W_)
    m["ln_final.bias"] = t(W_)
    m["text_projection"] = t(W_, EMBED)
    return m


def to_hf_state_dict(sd):
    tm, out = "text_model", {}
    out[f"{tm}.embeddings.token_embedding.weight"] = \
        sd["token_embedding.weight"]
    out[f"{tm}.embeddings.position_embedding.weight"] = \
        sd["positional_embedding"]
    for i in range(DEPTH):
        p, hl = f"transformer.resblocks.{i}", f"{tm}.encoder.layers.{i}"
        w, b = sd[f"{p}.attn.in_proj_weight"], sd[f"{p}.attn.in_proj_bias"]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            out[f"{hl}.self_attn.{name}.weight"] = w[j * W_:(j + 1) * W_]
            out[f"{hl}.self_attn.{name}.bias"] = b[j * W_:(j + 1) * W_]
        out[f"{hl}.self_attn.out_proj.weight"] = \
            sd[f"{p}.attn.out_proj.weight"]
        out[f"{hl}.self_attn.out_proj.bias"] = sd[f"{p}.attn.out_proj.bias"]
        out[f"{hl}.layer_norm1.weight"] = sd[f"{p}.ln_1.weight"]
        out[f"{hl}.layer_norm1.bias"] = sd[f"{p}.ln_1.bias"]
        out[f"{hl}.layer_norm2.weight"] = sd[f"{p}.ln_2.weight"]
        out[f"{hl}.layer_norm2.bias"] = sd[f"{p}.ln_2.bias"]
        out[f"{hl}.mlp.fc1.weight"] = sd[f"{p}.mlp.c_fc.weight"]
        out[f"{hl}.mlp.fc1.bias"] = sd[f"{p}.mlp.c_fc.bias"]
        out[f"{hl}.mlp.fc2.weight"] = sd[f"{p}.mlp.c_proj.weight"]
        out[f"{hl}.mlp.fc2.bias"] = sd[f"{p}.mlp.c_proj.bias"]
    out[f"{tm}.final_layer_norm.weight"] = sd["ln_final.weight"]
    out[f"{tm}.final_layer_norm.bias"] = sd["ln_final.bias"]
    # HF stores the projection as a bias-free Linear: weight = M^T
    out["text_projection.weight"] = sd["text_projection"].T.contiguous()
    return out


def test_clip_text_tower_matches_transformers():
    import jax.numpy as jnp

    from ovo_tpu.models import convert, text as text_mod
    from ovo_tpu.models.text import TextConfig

    rng = np.random.default_rng(1)
    sd = openai_text_sd(rng)
    params = convert.convert_text_tower({k: v for k, v in sd.items()})
    cfg = TextConfig(vocab_size=VOCAB, context_length=CTX, width=W_,
                     depth=DEPTH, n_heads=HEADS, mlp_ratio=HIDDEN / W_,
                     embed_dim=EMBED, causal=True, pool="argmax",
                     act="quick_gelu")

    # tokens: sot low, EOT = the highest id in each row (argmax pooling)
    toks = rng.integers(1, VOCAB - 2, (3, CTX)).astype(np.int32)
    toks[:, 0] = 0
    eot_pos = np.array([5, CTX - 1, 9])
    for r, pos in enumerate(eot_pos):
        toks[r, pos] = VOCAB - 1
        toks[r, pos + 1:] = 0 if pos + 1 < CTX else toks[r, pos + 1:]
    ours = np.asarray(text_mod.encode_text(params, cfg,
                                           jnp.asarray(toks)))

    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    hf_cfg = CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=W_, intermediate_size=HIDDEN,
        num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        max_position_embeddings=CTX, hidden_act="quick_gelu",
        projection_dim=EMBED, eos_token_id=VOCAB - 1,
        attention_dropout=0.0)
    model = CLIPTextModelWithProjection(hf_cfg).eval()
    missing, unexpected = model.load_state_dict(to_hf_state_dict(sd),
                                                strict=True)
    assert not missing and not unexpected
    with torch.no_grad():
        theirs = model(input_ids=torch.from_numpy(toks.astype(np.int64))
                       ).text_embeds.numpy()

    assert ours.shape == theirs.shape == (3, EMBED)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

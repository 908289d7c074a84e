"""Torch-checkpoint -> JAX param-tree weight conversion.

Covers the checkpoint families the reference loads (clip_utils.py:51-112):
CLIP/open_clip-style towers (visual.conv1 / transformer.resblocks /
attn.in_proj_weight naming, which the Perception-Encoder repo also follows),
the PE attention-pool probe head, and the WeightsPredictorMerger
(torch.nn.TransformerEncoder naming).

Conventions handled: nn.Linear (out,in) -> w.T; conv OIHW -> HWIO; merged
in_proj rows [q;k;v] -> qkv columns. Conversion is shape-checked; unmapped
required keys raise with the offending name.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


def _lin(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{prefix}.weight"]).T
    b = _np(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None
    return {"w": w, "b": b}


def _ln(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def _attn(sd: Dict, prefix: str) -> Dict[str, Any]:
    """nn.MultiheadAttention with merged in_proj."""
    if f"{prefix}.in_proj_weight" in sd:
        w = _np(sd[f"{prefix}.in_proj_weight"]).T          # (D, 3D)
        b = (_np(sd[f"{prefix}.in_proj_bias"])
             if f"{prefix}.in_proj_bias" in sd else None)
        qkv = {"w": w, "b": b}
        return {"qkv": qkv, "out": _lin(sd, f"{prefix}.out_proj")}
    return {"q": _lin(sd, f"{prefix}.q_proj"),
            "k": _lin(sd, f"{prefix}.k_proj"),
            "v": _lin(sd, f"{prefix}.v_proj"),
            "out": _lin(sd, f"{prefix}.out_proj")}


def convert_clip_block(sd: Dict, prefix: str) -> Dict[str, Any]:
    p = {
        "ln1": _ln(sd, f"{prefix}.ln_1"),
        "attn": _attn(sd, f"{prefix}.attn"),
        "ln2": _ln(sd, f"{prefix}.ln_2"),
        "mlp": {"fc": _lin(sd, f"{prefix}.mlp.c_fc"),
                "proj": _lin(sd, f"{prefix}.mlp.c_proj")},
    }
    if f"{prefix}.ls_1.gamma" in sd:
        p["ls1"] = _np(sd[f"{prefix}.ls_1.gamma"])
        p["ls2"] = _np(sd[f"{prefix}.ls_2.gamma"])
    return p


def convert_visual_tower(sd: Dict, prefix: str = "visual") -> Dict[str, Any]:
    n_blocks = 0
    while f"{prefix}.transformer.resblocks.{n_blocks}.ln_1.weight" in sd:
        n_blocks += 1
    if n_blocks == 0:
        raise KeyError(f"no transformer blocks under {prefix}.transformer")
    conv = _np(sd[f"{prefix}.conv1.weight"])               # (W, 3, p, p)
    params: Dict[str, Any] = {
        "patch": {"w": conv.transpose(2, 3, 1, 0),
                  "b": (_np(sd[f"{prefix}.conv1.bias"])
                        if f"{prefix}.conv1.bias" in sd
                        else np.zeros(conv.shape[0], np.float32))},
        "blocks": [convert_clip_block(sd, f"{prefix}.transformer.resblocks.{i}")
                   for i in range(n_blocks)],
        "ln_post": _ln(sd, f"{prefix}.ln_post"),
        "proj": _np(sd[f"{prefix}.proj"]),
    }
    if f"{prefix}.class_embedding" in sd:
        params["cls"] = _np(sd[f"{prefix}.class_embedding"]).reshape(-1)
    if f"{prefix}.positional_embedding" in sd:
        params["pos"] = _np(sd[f"{prefix}.positional_embedding"])
    if f"{prefix}.ln_pre.weight" in sd:
        params["ln_pre"] = _ln(sd, f"{prefix}.ln_pre")
    if f"{prefix}.attn_pool.probe" in sd:
        params["attn_pool"] = convert_attn_pool(sd, f"{prefix}.attn_pool")
    return params


def convert_attn_pool(sd: Dict, prefix: str) -> Dict[str, Any]:
    attn = _attn(sd, f"{prefix}.attn")
    if "qkv" in attn:
        w = attn["qkv"]["w"]
        d = w.shape[0]
        b = attn["qkv"]["b"]
        q = {"w": w[:, :d], "b": None if b is None else b[:d]}
        k = {"w": w[:, d:2 * d], "b": None if b is None else b[d:2 * d]}
        v = {"w": w[:, 2 * d:], "b": None if b is None else b[2 * d:]}
    else:
        q, k, v = attn["q"], attn["k"], attn["v"]
    ln_key = f"{prefix}.layernorm" if f"{prefix}.layernorm.weight" in sd \
        else f"{prefix}.ln"
    return {
        "probe": _np(sd[f"{prefix}.probe"]).reshape(1, -1),
        "ln": _ln(sd, ln_key),
        "q": q, "k": k, "v": v,
        "out": attn["out"],
    }


def convert_text_tower(sd: Dict, prefix: str = "") -> Dict[str, Any]:
    pre = f"{prefix}." if prefix else ""
    n_blocks = 0
    while f"{pre}transformer.resblocks.{n_blocks}.ln_1.weight" in sd:
        n_blocks += 1
    params = {
        "tok_embed": _np(sd[f"{pre}token_embedding.weight"]),
        "pos": _np(sd[f"{pre}positional_embedding"]),
        "blocks": [convert_clip_block(sd, f"{pre}transformer.resblocks.{i}")
                   for i in range(n_blocks)],
        "ln_final": _ln(sd, f"{pre}ln_final"),
    }
    # text_projection is a raw (D, E) matrix in OpenAI-CLIP checkpoints but
    # an nn.Linear in open_clip's SigLIP family (proj_bias: true in the
    # ViT-SO400M-14-SigLIP model configs) -- accept both forms
    if f"{pre}text_projection.weight" in sd:
        lin = _lin(sd, f"{pre}text_projection")
        params["proj"] = lin["w"]
        if lin["b"] is not None:
            params["proj_bias"] = lin["b"]
    else:
        params["proj"] = _np(sd[f"{pre}text_projection"])
    return params


def convert_timm_trunk(sd: Dict, prefix: str = "visual.trunk"
                       ) -> Dict[str, Any]:
    """timm ViT naming, as open_clip exposes SigLIP/SigLIP2 vision towers
    (visual.trunk.blocks.N.attn.qkv / mlp.fc1 / patch_embed.proj; MAP head
    visual.trunk.attn_pool.{latent,q,kv,proj,norm,mlp}). NOTE: validated
    structurally; real-checkpoint activation diffs still pending (no
    checkpoints ship in-image)."""
    n_blocks = 0
    while f"{prefix}.blocks.{n_blocks}.norm1.weight" in sd:
        n_blocks += 1
    if n_blocks == 0:
        raise KeyError(f"no timm blocks under {prefix}.blocks")

    def block(i):
        pre = f"{prefix}.blocks.{i}"
        return {
            "ln1": _ln(sd, f"{pre}.norm1"),
            "attn": {"qkv": _lin(sd, f"{pre}.attn.qkv"),
                     "out": _lin(sd, f"{pre}.attn.proj")},
            "ln2": _ln(sd, f"{pre}.norm2"),
            "mlp": {"fc": _lin(sd, f"{pre}.mlp.fc1"),
                    "proj": _lin(sd, f"{pre}.mlp.fc2")},
        }

    conv = _np(sd[f"{prefix}.patch_embed.proj.weight"])    # (W, 3, p, p)
    width = conv.shape[0]
    params: Dict[str, Any] = {
        "patch": {"w": conv.transpose(2, 3, 1, 0),
                  "b": _np(sd[f"{prefix}.patch_embed.proj.bias"])},
        "blocks": [block(i) for i in range(n_blocks)],
        "ln_post": _ln(sd, f"{prefix}.norm"),
        # SigLIP towers embed at trunk width (no separate projection)
        "proj": np.eye(width, dtype=np.float32),
    }
    pe = f"{prefix}.pos_embed"
    if pe in sd:
        params["pos"] = _np(sd[pe]).reshape(-1, width)
    ap = f"{prefix}.attn_pool"
    if f"{ap}.latent" in sd:
        kv = _np(sd[f"{ap}.kv.weight"])                    # (2W, W)
        kvb = (_np(sd[f"{ap}.kv.bias"]) if f"{ap}.kv.bias" in sd
               else np.zeros(kv.shape[0], np.float32))
        k_w, v_w = np.split(kv, 2, axis=0)
        k_b, v_b = np.split(kvb, 2, axis=0)
        params["attn_pool"] = {
            # timm applies no norm on the kv input (unlike PE's probe
            # head); its norm sits post-attention before the residual MLP
            "probe": _np(sd[f"{ap}.latent"]).reshape(1, width),
            "ln": None,
            "q": _lin(sd, f"{ap}.q"),
            "k": {"w": k_w.T, "b": k_b},
            "v": {"w": v_w.T, "b": v_b},
            "out": _lin(sd, f"{ap}.proj"),
        }
        if f"{ap}.mlp.fc1.weight" in sd:
            params["attn_pool"]["ln2"] = _ln(sd, f"{ap}.norm")
            params["attn_pool"]["mlp"] = {
                "fc": _lin(sd, f"{ap}.mlp.fc1"),
                "proj": _lin(sd, f"{ap}.mlp.fc2")}
    return params


def convert_clip_state_dict(sd: Dict) -> Dict[str, Any]:
    visual = (convert_timm_trunk(sd)
              if "visual.trunk.patch_embed.proj.weight" in sd
              else convert_visual_tower(sd, "visual"))
    params = {
        "visual": visual,
        "text": convert_text_tower(
            sd, "text" if "text.token_embedding.weight" in sd else ""),
        "logit_scale": _np(sd["logit_scale"]).reshape(())
        if "logit_scale" in sd else np.float32(np.log(1 / 0.07)),
        "logit_bias": _np(sd["logit_bias"]).reshape(())
        if "logit_bias" in sd else np.float32(0.0),
    }
    return params


def infer_vit_config(visual_params: Dict[str, Any], image_size: int,
                     base_cfg) -> Any:
    """Cross-check/override a registry ViTConfig from converted shapes."""
    import dataclasses

    patch = visual_params["patch"]["w"].shape[0]
    width = visual_params["patch"]["w"].shape[-1]
    depth = len(visual_params["blocks"])
    embed_dim = visual_params["proj"].shape[-1]
    return dataclasses.replace(
        base_cfg, patch_size=patch, width=width, depth=depth,
        embed_dim=embed_dim, image_size=image_size,
        use_cls_token="cls" in visual_params,
        use_abs_pos="pos" in visual_params,
        pool="attn" if "attn_pool" in visual_params else base_cfg.pool,
        ln_pre="ln_pre" in visual_params)


def load_clip_checkpoint(model_card: str, ckpt_path: str):
    """Load an official torch checkpoint into a CLIPModel."""
    import dataclasses

    import jax.numpy as jnp
    import torch

    from .clip import MODEL_REGISTRY, CLIPModel
    from .tokenizers import get_tokenizer
    import os

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params = convert_clip_state_dict(sd)
    base = MODEL_REGISTRY[model_card]
    vcfg = infer_vit_config(params["visual"], base.vision.image_size,
                            base.vision)
    tcfg = dataclasses.replace(
        base.text,
        vocab_size=params["text"]["tok_embed"].shape[0],
        context_length=params["text"]["pos"].shape[0],
        width=params["text"]["tok_embed"].shape[1],
        depth=len(params["text"]["blocks"]),
        embed_dim=params["text"]["proj"].shape[-1])
    cfg = dataclasses.replace(base, vision=vcfg, text=tcfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    tok = get_tokenizer(os.path.dirname(ckpt_path), tcfg.context_length,
                        card=cfg)
    return CLIPModel(cfg, params, tokenizer=tok)


def convert_merger_state_dict(sd: Dict) -> Dict[str, Any]:
    """torch.nn.TransformerEncoder naming: layers.N.{self_attn, linear1,
    linear2, norm1, norm2} + an MLP head."""
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    n = 0
    base = "encoder.layers" if any(k.startswith("encoder.layers") for k in sd) \
        else "transformer.layers"
    while f"{base}.{n}.norm1.weight" in sd:
        n += 1
    blocks = []
    for i in range(n):
        p = f"{base}.{i}"
        blocks.append({
            "ln1": _ln(sd, f"{p}.norm1"),
            "attn": _attn(sd, f"{p}.self_attn"),
            "ln2": _ln(sd, f"{p}.norm2"),
            "mlp": {"fc": _lin(sd, f"{p}.linear1"),
                    "proj": _lin(sd, f"{p}.linear2")},
        })
    head_names = [k for k in sd if "weight" in k and "layers" not in k
                  and "norm" not in k]
    head_names.sort()
    if len(head_names) < 2:
        raise KeyError(f"cannot locate merger MLP head among {list(sd)[:8]}")
    fc_name = head_names[0].rsplit(".weight", 1)[0]
    proj_name = head_names[-1].rsplit(".weight", 1)[0]
    return {"blocks": blocks,
            "head": {"fc": _lin(sd, fc_name), "proj": _lin(sd, proj_name)}}

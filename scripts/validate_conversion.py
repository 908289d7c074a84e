#!/usr/bin/env python
"""One-command checkpoint-conversion validation.

When real torch checkpoints land under data/input/, this script converts
them with models/convert.py and diffs EVERY transformer block's activations
(and the final embeddings) between the JAX tower and the torch f64 oracle
from the parity test suite -- the strongest conversion check available
without benchmark datasets (VERDICT round-1 missing #2c).

Usage:
  python scripts/validate_conversion.py clip PE-Core-L14-336 /path/to/ckpt.pt
  python scripts/validate_conversion.py sam hiera_l /path/to/sam2.1_ckpt.pt
  python scripts/validate_conversion.py clip tiny-pe --selftest

Exit code 0 iff every layer is within tolerance; prints a per-layer report.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

TOL = 2e-3   # bf16-free f32 towers vs f64 oracle, full depth


def report(name: str, ours: np.ndarray, ref: np.ndarray, failures: list):
    diff = float(np.abs(np.asarray(ours, np.float64) - ref).max())
    status = "ok" if diff < TOL else "FAIL"
    if diff >= TOL:
        failures.append(name)
    print(f"  {name:40s} max|diff| = {diff:.3e}  [{status}]")


def validate_clip(model_card: str, ckpt_path: str | None) -> list:
    import jax.numpy as jnp
    import torch

    from ovo_tpu.models import text as text_mod
    from ovo_tpu.models import vit as vit_mod
    from ovo_tpu.models.clip import CLIPModel
    from ovo_tpu.models.convert import load_clip_checkpoint
    from test_pe_textregion_torch_parity import (
        ln, rope2d_tables, t64, torch_attn_pool, torch_block,
        torch_encode_text, torch_forward_features)

    if ckpt_path is None:   # --selftest: random weights, same machinery
        model = CLIPModel.random_init(model_card)
    else:
        model = load_clip_checkpoint(model_card, ckpt_path)
    cfg = model.cfg
    params = model.params
    failures: list = []

    rng = np.random.default_rng(0)
    size = cfg.vision.image_size
    imgs = rng.random((1, size, size, 3)).astype(np.float32)
    pre = np.asarray(model.preprocess(jnp.asarray(imgs)))

    # block-by-block: rebuild the prefix of the tower in both frameworks
    print(f"[clip:{model_card}] visual tower, {cfg.vision.depth} blocks")
    vis = params["visual"]
    x_j = vit_mod.patchify(vis["patch"], jnp.asarray(pre),
                           cfg.vision.patch_size)
    grid = int(round(x_j.shape[1] ** 0.5))
    n_prefix = 1 if cfg.vision.use_cls_token else 0
    if cfg.vision.use_cls_token:
        cls = jnp.broadcast_to(vis["cls"], (1, 1, x_j.shape[-1]))
        x_j = jnp.concatenate([cls, x_j], axis=1)
    if cfg.vision.use_abs_pos:
        x_j = x_j + vis["pos"]
    import torch.nn.functional as F

    w = t64(vis["patch"]["w"]).permute(3, 2, 0, 1)
    x_t = F.conv2d(t64(pre).permute(0, 3, 1, 2), w, t64(vis["patch"]["b"]),
                   stride=cfg.vision.patch_size)
    x_t = x_t.permute(0, 2, 3, 1).reshape(1, grid * grid, -1)
    if cfg.vision.use_cls_token:
        x_t = torch.cat([t64(vis["cls"]).expand(1, 1, -1), x_t], dim=1)
    if cfg.vision.use_abs_pos:
        x_t = x_t + t64(vis["pos"])
    report("patchify+pos", np.asarray(x_j), x_t.numpy(), failures)

    from ovo_tpu.models import layers as L

    rope_j = rope_t = None
    if cfg.vision.use_rope2d:
        hd = cfg.vision.width // cfg.vision.n_heads
        rope_j = L.rope2d_freqs(grid, grid, hd, n_prefix=n_prefix)
        rope_t = rope2d_tables(grid, hd, n_prefix)
    if cfg.vision.ln_pre:
        x_j = L.layer_norm(vis["ln_pre"], x_j)
        x_t = ln(vis["ln_pre"], x_t)
    for i, blk in enumerate(vis["blocks"]):
        x_j = L.transformer_block(blk, x_j, cfg.vision.n_heads, rope=rope_j,
                                  act=cfg.vision.act)
        x_t = torch_block(blk, x_t, cfg.vision.n_heads, rope=rope_t)
        report(f"block[{i}]", np.asarray(x_j), x_t.numpy(), failures)
    x_j = L.layer_norm(vis["ln_post"], x_j)
    x_t = ln(vis["ln_post"], x_t)
    report("ln_post", np.asarray(x_j), x_t.numpy(), failures)

    if cfg.vision.pool == "attn":
        pooled_j = vit_mod.attn_pool(vis["attn_pool"], x_j,
                                     cfg.vision.n_heads)
        pooled_t = torch_attn_pool(vis["attn_pool"], x_t,
                                   cfg.vision.n_heads)
        report("attn_pool", np.asarray(pooled_j), pooled_t.numpy(), failures)

    emb_j = model.encode_image(jnp.asarray(imgs))
    full_t = torch_forward_features(vis, cfg.vision, t64(pre))
    emb_t = (torch_attn_pool(vis["attn_pool"], full_t, cfg.vision.n_heads)
             @ t64(vis["proj"])) if cfg.vision.pool == "attn" else None
    if emb_t is not None:
        report("encode_image", np.asarray(emb_j), emb_t.numpy(), failures)

    print(f"[clip:{model_card}] text tower")
    tokens = np.asarray(model.tokenizer(["a chair", "the floor"]))
    # selftest runs the HashTokenizer whose ids live in the FULL BPE id
    # space; fold them into a tiny card's vocab (real ckpts ship a vocab)
    tokens = np.minimum(tokens, cfg.text.vocab_size - 1)
    txt_j = text_mod.encode_text(params["text"], cfg.text,
                                 jnp.asarray(tokens))
    txt_t = torch_encode_text(params["text"], cfg.text, tokens)
    report("encode_text", np.asarray(txt_j), txt_t.numpy(), failures)
    return failures


def validate_sam(encoder: str, ckpt_path: str | None) -> list:
    import jax.numpy as jnp

    from ovo_tpu.models.convert_sam import load_sam_checkpoint
    from ovo_tpu.models.sam.hiera import hiera_forward
    from ovo_tpu.models.sam.model import SAMModel
    from test_hiera_torch_parity import torch_hiera_forward  # type: ignore

    if ckpt_path is None:   # --selftest
        model = SAMModel.random_init(encoder, image_size=256)
    else:
        model = load_sam_checkpoint(encoder, ckpt_path)
    failures: list = []
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 256, 256, 3)).astype(np.float32)
    outs_j = hiera_forward(model.params["trunk"], model.cfg.hiera,
                           jnp.asarray(img))
    outs_t = torch_hiera_forward(model.params["trunk"], model.cfg.hiera, img)
    for i, (a, b) in enumerate(zip(outs_j, outs_t)):
        report(f"hiera stage[{i}]", np.asarray(a), np.asarray(b), failures)
    return failures


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=["clip", "sam"])
    ap.add_argument("model_card")
    ap.add_argument("ckpt_path", nargs="?")
    ap.add_argument("--selftest", action="store_true",
                    help="random weights: prove the diff machinery itself")
    args = ap.parse_args()
    if not args.selftest:
        if not args.ckpt_path or not os.path.exists(args.ckpt_path):
            sys.exit(f"checkpoint not found: {args.ckpt_path}")
    ckpt = None if args.selftest else args.ckpt_path
    if args.family == "clip":
        failures = validate_clip(args.model_card, ckpt)
    else:
        failures = validate_sam(args.model_card, ckpt)
    if failures:
        sys.exit(f"CONVERSION INVALID: {len(failures)} layer(s) off: "
                 f"{failures}")
    print("conversion valid: every layer within tolerance")


if __name__ == "__main__":
    main()

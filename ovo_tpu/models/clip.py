"""CLIP-family model zoo + the per-segment embedders.

Reference behavior: CLIPGenerator (/root/reference/ovo/entities/
clip_generator.py) with its three embedding pipelines:
  (a) vanilla        -- CLIP(masked crop) only
  (b) multi-crop     -- global+seg+bbox crops fused by fixed/adaptive/
                        hovsg/concept-fusion weights or the learned merger
  (c) TextRegion     -- PE patch features + masked attention pooling
                        (the current default, ovo.yaml embed_type)

All crops/resizes/pooling are device ops; the ViT forwards run through the
Pallas attention path. Model weights load via convert.py from the official
torch checkpoints; random-weight models support every structural test.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.similarity import (clip_cosine_similarity, fuse_clips,
                              siglip_similarity)
from . import text as text_mod
from . import vit as vit_mod
from .text import TextConfig
from .tokenizers import get_tokenizer
from .vit import ViTConfig

Array = jax.Array

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass(frozen=True)
class CLIPModelConfig:
    name: str
    vision: ViTConfig
    text: TextConfig
    mean: Tuple[float, float, float] = OPENAI_MEAN
    std: Tuple[float, float, float] = OPENAI_STD
    siglip: bool = False           # sigmoid similarity w/ scale+bias
    clip_dim: int = 1024


# Architecture hyperparameters follow the published model cards the
# reference selects from (clip_utils.py:51-86). Exact parity is enforced at
# weight-conversion time (convert.py infers depth/width from checkpoints and
# cross-checks these entries).
MODEL_REGISTRY: Dict[str, CLIPModelConfig] = {
    "PE-Core-L14-336": CLIPModelConfig(
        name="PE-Core-L14-336",
        vision=ViTConfig(image_size=336, patch_size=14, width=1024, depth=24,
                         n_heads=16, embed_dim=1024, use_cls_token=True,
                         use_abs_pos=True, use_rope2d=True, pool="attn",
                         dtype=jnp.bfloat16),
        text=TextConfig(vocab_size=49408, context_length=32, width=1024,
                        depth=24, n_heads=16, embed_dim=1024, causal=True,
                        pool="argmax"),
        clip_dim=1024),
    "SigLIP-384": CLIPModelConfig(
        name="SigLIP-384",
        vision=ViTConfig(image_size=384, patch_size=14, width=1152, depth=27,
                         n_heads=16, mlp_ratio=3.7362, embed_dim=1152,
                         use_cls_token=False, use_abs_pos=True, pool="attn"),
        text=TextConfig(vocab_size=32000, context_length=64, width=1152,
                        depth=27, n_heads=16, mlp_ratio=3.7362,
                        embed_dim=1152, causal=False,
                        pool="last"),
        mean=SIGLIP_MEAN, std=SIGLIP_STD, siglip=True, clip_dim=1152),
    "ViT-H-14": CLIPModelConfig(
        name="ViT-H-14",
        vision=ViTConfig(image_size=224, patch_size=14, width=1280, depth=32,
                         n_heads=16, embed_dim=1024, use_cls_token=True,
                         use_abs_pos=True, pool="cls", ln_pre=True),
        text=TextConfig(vocab_size=49408, context_length=77, width=1024,
                        depth=24, n_heads=16, embed_dim=1024, causal=True,
                        pool="argmax"),
        clip_dim=1024),
    "SigLIP": CLIPModelConfig(
        # hf-hub:timm/ViT-SO400M-14-SigLIP @ 224 (clip_utils.py:55)
        name="SigLIP",
        vision=ViTConfig(image_size=224, patch_size=14, width=1152, depth=27,
                         n_heads=16, mlp_ratio=3.7362, embed_dim=1152,
                         use_cls_token=False, use_abs_pos=True, pool="attn"),
        text=TextConfig(vocab_size=32000, context_length=64, width=1152,
                        depth=27, n_heads=16, mlp_ratio=3.7362,
                        embed_dim=1152, causal=False,
                        pool="last"),
        mean=SIGLIP_MEAN, std=SIGLIP_STD, siglip=True, clip_dim=1152),
    "SigLIP2-384": CLIPModelConfig(
        # hf-hub:timm/ViT-SO400M-16-SigLIP2-384 (clip_utils.py:57): patch 16,
        # Gemma 256k-token vocabulary on the text side
        name="SigLIP2-384",
        vision=ViTConfig(image_size=384, patch_size=16, width=1152, depth=27,
                         n_heads=16, mlp_ratio=3.7362, embed_dim=1152,
                         use_cls_token=False, use_abs_pos=True, pool="attn"),
        text=TextConfig(vocab_size=256000, context_length=64, width=1152,
                        depth=27, n_heads=16, mlp_ratio=3.7362,
                        embed_dim=1152, causal=False,
                        pool="last"),
        mean=SIGLIP_MEAN, std=SIGLIP_STD, siglip=True, clip_dim=1152),
    "ViT-B-16-qg": CLIPModelConfig(
        # hf-hub:apple/DFN2B-CLIP-ViT-B-16 (clip_utils.py:59): OpenAI-CLIP
        # architecture with quick-gelu
        name="ViT-B-16-qg",
        vision=ViTConfig(image_size=224, patch_size=16, width=768, depth=12,
                         n_heads=12, embed_dim=512, use_cls_token=True,
                         use_abs_pos=True, pool="cls", ln_pre=True,
                         act="quick_gelu"),
        text=TextConfig(vocab_size=49408, context_length=77, width=512,
                        depth=12, n_heads=8, embed_dim=512, causal=True,
                        pool="argmax", act="quick_gelu"),
        clip_dim=512),
    "ViT-L-14-qg": CLIPModelConfig(
        # hf-hub:apple/DFN2B-CLIP-ViT-L-14-39B (clip_utils.py:60)
        name="ViT-L-14-qg",
        vision=ViTConfig(image_size=224, patch_size=14, width=1024, depth=24,
                         n_heads=16, embed_dim=768, use_cls_token=True,
                         use_abs_pos=True, pool="cls", ln_pre=True,
                         act="quick_gelu"),
        text=TextConfig(vocab_size=49408, context_length=77, width=768,
                        depth=12, n_heads=12, embed_dim=768, causal=True,
                        pool="argmax", act="quick_gelu"),
        clip_dim=768),
    "ViT-H-14-qg": CLIPModelConfig(
        # hf-hub:apple/DFN5B-CLIP-ViT-H-14 (clip_utils.py:61)
        name="ViT-H-14-qg",
        vision=ViTConfig(image_size=224, patch_size=14, width=1280, depth=32,
                         n_heads=16, embed_dim=1024, use_cls_token=True,
                         use_abs_pos=True, pool="cls", ln_pre=True,
                         act="quick_gelu"),
        text=TextConfig(vocab_size=49408, context_length=77, width=1024,
                        depth=24, n_heads=16, embed_dim=1024, causal=True,
                        pool="argmax", act="quick_gelu"),
        clip_dim=1024),
    "ViT-H-14-378qg": CLIPModelConfig(
        # hf-hub:apple/DFN5B-CLIP-ViT-H-14-378 (clip_utils.py:62)
        name="ViT-H-14-378qg",
        vision=ViTConfig(image_size=378, patch_size=14, width=1280, depth=32,
                         n_heads=16, embed_dim=1024, use_cls_token=True,
                         use_abs_pos=True, pool="cls", ln_pre=True,
                         act="quick_gelu"),
        text=TextConfig(vocab_size=49408, context_length=77, width=1024,
                        depth=24, n_heads=16, embed_dim=1024, causal=True,
                        pool="argmax", act="quick_gelu"),
        clip_dim=1024),
}
# the reference spells the PE card with an extra dash (clip_utils.py:63)
MODEL_REGISTRY["PE-Core-L-14-336"] = MODEL_REGISTRY["PE-Core-L14-336"]
# test-scale model for structural tests and smoke runs
MODEL_REGISTRY["tiny-test"] = CLIPModelConfig(
    name="tiny-test",
    vision=ViTConfig(image_size=64, patch_size=16, width=64, depth=2,
                     n_heads=4, embed_dim=32, use_cls_token=True,
                     use_abs_pos=True, pool="attn"),
    text=TextConfig(vocab_size=1024, context_length=16, width=64, depth=2,
                    n_heads=4, embed_dim=32, causal=True, pool="argmax"),
    clip_dim=32)
# PE-Core structure at test scale (RoPE-2D + cls + abs-pos + probe pool,
# f32): the torch-oracle parity suite runs the FULL tower on this card
MODEL_REGISTRY["tiny-pe"] = CLIPModelConfig(
    name="tiny-pe",
    vision=ViTConfig(image_size=64, patch_size=16, width=64, depth=3,
                     n_heads=4, embed_dim=32, use_cls_token=True,
                     use_abs_pos=True, use_rope2d=True, pool="attn"),
    text=TextConfig(vocab_size=1024, context_length=16, width=64, depth=3,
                    n_heads=4, embed_dim=32, causal=True, pool="argmax"),
    clip_dim=32)


class CLIPModel:
    """Image+text towers + logit scale/bias, with preprocess."""

    def __init__(self, cfg: CLIPModelConfig, params: Dict[str, Any],
                 tokenizer=None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer or get_tokenizer(
            context_length=cfg.text.context_length, card=cfg)
        self._mean = jnp.asarray(cfg.mean, jnp.float32)
        self._std = jnp.asarray(cfg.std, jnp.float32)

    @classmethod
    def random_init(cls, name: str, seed: int = 0) -> "CLIPModel":
        cfg = MODEL_REGISTRY[name]
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        params = {
            "visual": vit_mod.init_vit(k1, cfg.vision),
            "text": text_mod.init_text(k2, cfg.text),
            "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
            "logit_bias": jnp.asarray(-10.0 if cfg.siglip else 0.0,
                                      jnp.float32),
        }
        return cls(cfg, params)

    # -- preprocessing (Resize + Normalize, the transforms the reference
    # keeps after stripping PIL ops, clip_utils.py:83-85) ---------------
    def preprocess(self, images: Array, size: Optional[int] = None) -> Array:
        """images (..., H, W, 3) float in [0,1] -> normalized model input."""
        size = size or self.cfg.vision.image_size
        if images.shape[-3] != size or images.shape[-2] != size:
            from ..ops.resize import resize_channels_last

            lead = images.shape[:-3]
            flat = images.reshape((-1,) + images.shape[-3:]) \
                if lead else images
            flat = resize_channels_last(flat, (size, size))
            images = flat.reshape(lead + (size, size, 3)) if lead else flat
        return (images - self._mean) / self._std

    # -- encoders -------------------------------------------------------
    def encode_image(self, images: Array, preprocessed: bool = False) -> Array:
        x = images if preprocessed else self.preprocess(images)
        return vit_mod.encode(self.params["visual"], self.cfg.vision, x)

    def forward_features(self, images: Array, preprocessed: bool = False
                         ) -> Array:
        x = images if preprocessed else self.preprocess(images)
        return vit_mod.forward_features(self.params["visual"],
                                        self.cfg.vision, x, norm=True)

    def encode_text(self, texts: Sequence[str]) -> Array:
        tokens = jnp.asarray(self.tokenizer(list(texts)))
        return text_mod.encode_text(self.params["text"], self.cfg.text,
                                    tokens)

    def similarity(self, txt_embeds: Array, img_embeds: Array) -> Array:
        if self.cfg.siglip:
            return siglip_similarity(txt_embeds, img_embeds,
                                     self.params["logit_scale"],
                                     self.params["logit_bias"])
        return clip_cosine_similarity(txt_embeds, img_embeds)


def _normalize(x: Array) -> Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Device ROI crops (segmap2segimg equivalent, segment_utils.py:29-146)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_size", "bbox_margin"))
def roi_crops(image: Array, masks: Array, *, out_size: int,
              bbox_margin: int = 50) -> Tuple[Array, Array]:
    """For each mask: (a) masked-object crop on black background, resized to
    (out_size, out_size) with aspect-preserving square padding; (b) bbox
    context crop grown by ``bbox_margin`` px, resized (no padding) --
    mirroring get_seg_img/get_bbox_img. image (H, W, 3) in [0,1] f32;
    masks (M, H, W) bool. Returns (seg_imgs, bbox_imgs) each (M, s, s, 3).
    """
    H, W = image.shape[:2]

    def bbox_of(m):
        rows = jnp.any(m, axis=1)
        cols = jnp.any(m, axis=0)
        ridx = jnp.arange(H)
        cidx = jnp.arange(W)
        y0 = jnp.min(jnp.where(rows, ridx, H))
        y1 = jnp.max(jnp.where(rows, ridx, -1))
        x0 = jnp.min(jnp.where(cols, cidx, W))
        x1 = jnp.max(jnp.where(cols, cidx, -1))
        empty = ~jnp.any(m)
        return jnp.where(empty, 0, x0), jnp.where(empty, 0, y0), \
            jnp.where(empty, 1, x1 + 1 - x0), jnp.where(empty, 1, y1 + 1 - y0)

    def crop_resize(img, x0, y0, w, h, size):
        # scale_and_translate: map the (w, h) window onto (size, size)
        scale = jnp.asarray([size / h.astype(jnp.float32),
                             size / w.astype(jnp.float32)])
        translation = -jnp.asarray([y0.astype(jnp.float32) * scale[0],
                                    x0.astype(jnp.float32) * scale[1]])
        return jax.image.scale_and_translate(
            img, (size, size, 3), (0, 1), scale, translation,
            method="bilinear")

    def square_pad_crop(img, m, x0, y0, w, h, size):
        # masked image, crop to bbox, pad to square, resize
        masked = jnp.where(m[..., None], img, 0.0)
        side = jnp.maximum(w, h).astype(jnp.float32)
        # center the bbox inside the square window
        sx0 = x0.astype(jnp.float32) - (side - w.astype(jnp.float32)) / 2
        sy0 = y0.astype(jnp.float32) - (side - h.astype(jnp.float32)) / 2
        scale = jnp.asarray([size / side, size / side])
        translation = -jnp.asarray([sy0 * scale[0], sx0 * scale[1]])
        return jax.image.scale_and_translate(
            masked, (size, size, 3), (0, 1), scale, translation,
            method="bilinear")

    def margin_bbox(x0, y0, w, h):
        nx0 = jnp.maximum(x0 - bbox_margin, 0)
        ny0 = jnp.maximum(y0 - bbox_margin, 0)
        nw = jnp.minimum(w + (x0 - nx0) + bbox_margin, W - nx0)
        nh = jnp.minimum(h + (y0 - ny0) + bbox_margin, H - ny0)
        return nx0, ny0, nw, nh

    def per_mask(m):
        x0, y0, w, h = bbox_of(m)
        seg = square_pad_crop(image, m, x0, y0, w, h, out_size)
        bx0, by0, bw, bh = margin_bbox(x0, y0, w, h)
        bbox = crop_resize(image, bx0, by0, bw, bh, out_size)
        return seg, bbox

    return jax.vmap(per_mask)(masks)


# ---------------------------------------------------------------------------
# Embedders
# ---------------------------------------------------------------------------

class BaseCLIPEmbedder:
    def __init__(self, model: CLIPModel):
        self.model = model
        self.clip_dim = model.cfg.clip_dim

    def embed_text(self, texts: Sequence[str]) -> Array:
        emb = self.model.encode_text(texts)
        return _normalize(emb)

    def similarity(self, txt_embeds: Array, ins_desc: Array) -> Array:
        return self.model.similarity(txt_embeds, ins_desc)


class CropCLIPEmbedder(BaseCLIPEmbedder):
    """vanilla / multi-crop fusion pipelines (clip_generator.py:136-158)."""

    def __init__(self, model: CLIPModel, embed_type: str = "vanilla",
                 mask_res: int = 336, w_masked: float = 0.4418,
                 w_global: float = 0.1, merger=None):
        super().__init__(model)
        self.embed_type = embed_type
        self.mask_res = mask_res
        self.w_masked = w_masked
        self.w_global = w_global
        self.merger = merger

    def embed_masks(self, image, binary_maps, valid) -> Array:
        img = jnp.asarray(image, jnp.float32) / 255.0
        masks = jnp.asarray(binary_maps)
        seg_imgs, bbox_imgs = roi_crops(img, masks, out_size=self.mask_res)
        clip_seg = _normalize(self.model.encode_image(seg_imgs))
        if self.embed_type == "vanilla":
            return clip_seg
        clip_bbox = _normalize(self.model.encode_image(bbox_imgs))
        clip_g = _normalize(self.model.encode_image(img[None]))
        clip_g = jnp.broadcast_to(clip_g, clip_seg.shape)
        if self.embed_type == "learned":
            assert self.merger is not None, "learned fusion needs a merger"
            stacked = jnp.stack([clip_g, clip_seg, clip_bbox], axis=1)
            return self.merger(stacked)
        return fuse_clips(clip_g, clip_seg, clip_bbox, self.embed_type,
                          self.w_masked, self.w_global)


def build_clip_embedder(clip_cfg: Dict[str, Any], embed_type: str):
    """Factory from the reference's clip config section."""
    model_card = clip_cfg.get("model_card", "SigLIP-384")
    # canonicalize reference naming (PE-Core-L14-336 vs PE-Core-L-14-336)
    card = model_card.replace("PE-Core-L-14-336", "PE-Core-L14-336")
    ckpt_path = clip_cfg.get("ckpt_path")
    if ckpt_path and os.path.exists(ckpt_path):
        from .convert import load_clip_checkpoint

        model = load_clip_checkpoint(card, ckpt_path)
    else:
        model = CLIPModel.random_init(card)
        if ckpt_path:
            print(f"[ovo_tpu] WARNING: checkpoint {ckpt_path} not found; "
                  f"using random weights for {card}")

    if embed_type == "TextRegion":
        from .textregion import TextRegionEmbedder

        return TextRegionEmbedder(
            model,
            resize_method=clip_cfg.get("resize_method", "multi_resolution"),
            remove_global_patch=clip_cfg.get("remove_global_patch", False),
            project_and_normalize=clip_cfg.get("project_and_normalize", True))
    merger = None
    if embed_type == "learned":
        from .merger import load_merger

        merger = load_merger(clip_cfg.get("weights_predictor_path"))
    return CropCLIPEmbedder(model, embed_type,
                            mask_res=clip_cfg.get("mask_res", 336),
                            w_masked=clip_cfg.get("w_masked", 0.4418),
                            w_global=clip_cfg.get("w_global", 0.1),
                            merger=merger)

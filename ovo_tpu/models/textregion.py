"""TextRegion per-segment embedding on the Perception-Encoder tower.

Reference behavior: PETextRegion (/root/reference/ovo/entities/
textregion.py:52-203):

  1. multi-resolution feature grid: the full image plus a crop grid
     (ceil-covering tiles of crop_size) each run through the ViT; the global
     token grid is bilinearly upsampled to the tiled resolution and each
     tile's tokens blended in at half weight (resize_features, :9-28);
  2. per-mask soft feature masks: region masks bilinearly resized to the
     token grid, clamped to [0,1] (:145-161);
  3. optional global-patch removal by belong-vs-outside similarity (:31-50);
  4. masked attention pool with the PE probe head: q = probe, k = LN(mean of
     tokens) broadcast, v = tokens, key_padding_mask = mask <= 0 (:163-195)
     -- evaluated here by the fused Pallas masked-pool kernel with SHARED
     tokens across masks;
  5. projection + L2 normalization.

This is the per-keyframe semantic hot path; everything below is one jitted
program per (image-shape, M) combination.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.masked_pool import masked_single_query_attention
from ..ops.resize import resize_channels_last, resize_planes
from . import layers as L
from . import vit as vit_mod
from .clip import CLIPModel, _normalize

Array = jax.Array


class TextRegionEmbedder:
    def __init__(self, model: CLIPModel,
                 resize_method: str = "multi_resolution",
                 remove_global_patch: bool = False,
                 global_patch_threshold: float = 0.07,
                 project_and_normalize: bool = True):
        self.model = model
        self.clip_dim = model.cfg.clip_dim
        self.resize_method = resize_method
        self.remove_global_patch = remove_global_patch
        self.global_patch_threshold = global_patch_threshold
        self.project_and_normalize = project_and_normalize
        self.crop_size = model.cfg.vision.image_size
        self.patch_size = model.cfg.vision.patch_size

    # -- public embedder interface --------------------------------------
    def embed_masks(self, image, binary_maps, valid) -> Array:
        # u8 frames normalize INSIDE the jitted program (fewer dispatches)
        img = jnp.asarray(image)
        if img.dtype not in (jnp.uint8, jnp.float32):
            img = img.astype(jnp.float32) / 255.0
        masks = jnp.asarray(binary_maps)
        return self._predict(img, masks)

    def embed_masks_batch(self, images, binary_maps, valid) -> Array:
        """Micro-batched per-keyframe embedding: images (B, H, W, 3),
        binary_maps (B, M, H, W) -> (B, M, D). One program; the ViT sees
        B x (1 + crops) views, which roughly doubles MXU utilization at
        the per-keyframe batch sizes here."""
        imgs = jnp.asarray(images)
        if imgs.dtype not in (jnp.uint8, jnp.float32):
            imgs = imgs.astype(jnp.float32) / 255.0
        masks = jnp.asarray(binary_maps)
        return jax.vmap(self._predict)(imgs, masks)

    def embed_text(self, texts):
        return _normalize(self.model.encode_text(texts))

    def similarity(self, txt_embeds, ins_desc):
        return self.model.similarity(txt_embeds, ins_desc)

    # -- internals -------------------------------------------------------
    def _crop_layout(self, h: int, w: int) -> Tuple[int, int]:
        if self.resize_method != "multi_resolution":
            return 0, 0
        return max(h // self.crop_size, 1), max(w // self.crop_size, 1)

    def _predict(self, image: Array, masks: Array) -> Array:
        h, w = image.shape[:2]
        ch, cw = self._crop_layout(h, w)
        return _textregion_program(
            self.model.params, self.model.cfg.vision, image, masks,
            mean=self.model._mean, std=self.model._std,
            crop_size=self.crop_size, patch_size=self.patch_size,
            crop_num_h=ch, crop_num_w=cw,
            remove_global=self.remove_global_patch,
            gp_threshold=self.global_patch_threshold,
            project=self.project_and_normalize)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "crop_size", "patch_size", "crop_num_h",
                     "crop_num_w", "remove_global", "gp_threshold",
                     "project"))
def _textregion_program(params: Dict[str, Any], cfg, image: Array,
                        masks: Array, *, mean: Array, std: Array,
                        crop_size: int, patch_size: int, crop_num_h: int,
                        crop_num_w: int, remove_global: bool,
                        gp_threshold: float, project: bool) -> Array:
    h, w = image.shape[:2]
    if image.dtype == jnp.uint8:
        image = image.astype(jnp.float32) / 255.0
    patch_num = crop_size // patch_size
    n_prefix = 1 if cfg.use_cls_token else 0

    def prep(img_hw3: Array) -> Array:
        x = resize_channels_last(img_hw3, (crop_size, crop_size))
        return (x - mean) / std

    if crop_num_h == 0:  # single-resolution path
        pph = ppw = patch_num
        inputs = prep(image)[None]
    else:
        pph, ppw = patch_num * crop_num_h, patch_num * crop_num_w
        crop_h, crop_w = -(-h // crop_num_h), -(-w // crop_num_w)
        views = [prep(image)]
        for hi in range(crop_num_h):
            for wi in range(crop_num_w):
                y1 = min(hi * crop_h + crop_h, h) - crop_h
                x1 = min(wi * crop_w + crop_w, w) - crop_w
                y1, x1 = max(y1, 0), max(x1, 0)
                views.append(prep(jax.lax.dynamic_slice(
                    image, (y1, x1, 0), (crop_h, crop_w, 3))))
        inputs = jnp.stack(views)

    tokens = vit_mod.forward_features(params["visual"], cfg, inputs,
                                      norm=True)
    tokens = tokens[:, n_prefix:]                       # drop cls

    if crop_num_h == 0:
        x_input = tokens[0]                             # (L, D)
    else:
        # resize_features (textregion.py:9-28): upsample the global grid,
        # blend each tile's tokens at half weight
        D = tokens.shape[-1]
        global_grid = tokens[0].reshape(patch_num, patch_num, D)
        canvas = resize_channels_last(global_grid, (pph, ppw))
        crop_id = 1
        for hi in range(crop_num_h):
            for wi in range(crop_num_w):
                tile = tokens[crop_id].reshape(patch_num, patch_num, D)
                y0, x0 = hi * patch_num, wi * patch_num
                blended = 0.5 * jax.lax.dynamic_slice(
                    canvas, (y0, x0, 0), (patch_num, patch_num, D)) + tile
                canvas = jax.lax.dynamic_update_slice(canvas, blended,
                                                      (y0, x0, 0))
                crop_id += 1
        x_input = canvas.reshape(pph * ppw, D)

    # soft feature masks (textregion.py:145-161)
    M = masks.shape[0]
    # 2-tap bilinear downscale like the reference's F.interpolate (jax's
    # resize would antialias); runs as matmuls
    fmask = resize_planes(masks.astype(jnp.float32), (pph, ppw))
    fmask = jnp.clip(fmask.reshape(M, pph * ppw), 0.0, 1.0)

    if remove_global:
        fmask = _remove_global_patch(x_input, fmask, gp_threshold)

    # masked attention pool with the probe head (textregion.py:183-195)
    pool = params["visual"]["attn_pool"]
    n_heads = cfg.n_heads
    D = x_input.shape[-1]
    hd = D // n_heads
    k_in = L.layer_norm(pool["ln"], jnp.mean(x_input, axis=0, keepdims=True))
    q = L.linear(pool["q"], pool["probe"].astype(x_input.dtype))  # (1, D)
    k = L.linear(pool["k"], k_in)                                 # (1, D)
    v = L.linear(pool["v"], x_input)                              # (L, D)
    Lt = v.shape[0]
    qh = jnp.broadcast_to(q.reshape(1, n_heads, hd), (M, n_heads, hd))
    kh = jnp.broadcast_to(k.reshape(n_heads, 1, hd), (n_heads, Lt, hd))
    vh = v.reshape(Lt, n_heads, hd).transpose(1, 0, 2)
    pooled = masked_single_query_attention(qh, kh, vh, fmask > 0)
    pooled = L.linear(pool["out"], pooled.reshape(M, D))

    if not project:
        return pooled.astype(jnp.float32)
    # project + normalize in f32: descriptors are accumulated/compared
    # downstream and bf16 normalization would cost similarity precision
    region = pooled.astype(jnp.float32) @ params["visual"]["proj"]
    return _normalize(region)


def _remove_global_patch(x_input: Array, fmask: Array, threshold: float
                         ) -> Array:
    """Zero mask weights of patches more similar to the outside of regions
    than the inside (textregion.py:31-50)."""
    unit = x_input / jnp.maximum(
        jnp.linalg.norm(x_input, axis=-1, keepdims=True), 1e-12)
    sim = unit @ unit.T                                   # (L, L)
    inside = (fmask > 0).astype(jnp.float32)              # (M, L)
    p2r = sim @ inside.T                                  # (L, M)
    p2r_avg = p2r / jnp.maximum(inside.sum(axis=-1), 1e-9)
    belong = (p2r_avg * inside.T).sum(axis=-1) / (inside.sum(axis=0) + 1e-9)
    outside = (1.0 - inside)
    out_score = (p2r_avg * outside.T).sum(axis=-1) / (outside.sum(axis=0) + 1e-9)
    diff = belong - out_score                             # (L,)
    return jnp.where(diff[None, :] < threshold, 0.0, fmask)

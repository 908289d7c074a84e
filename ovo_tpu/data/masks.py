"""Mask sources: precomputed-mask store (reference-compatible .npy layout)
and recorded/synthetic fixtures for model-free pipeline runs.

Parity target: MaskGenerator's precomputed mode
(/root/reference/ovo/entities/mask_generator.py:122-195): per-frame files
``{frame:04d}_seg_map_default.npy`` / ``{frame:04d}_bmap_default.npy``.

Every source returns FIXED-SHAPE device tensors:
  (seg_map (H,W) i32, binary_maps (M,H,W) bool, valid (M,) bool)
with masks beyond ``max_masks`` dropped in stability order (lowest first),
and the seg map values re-indexed to the padded mask axis.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def pad_masks(seg_map: np.ndarray, binary_maps: np.ndarray, max_masks: int
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad/truncate a (possibly empty) mask set to the fixed mask axis."""
    h, w = seg_map.shape
    n = binary_maps.shape[0] if binary_maps.ndim == 3 else 0
    out_seg = np.full((h, w), -1, np.int32)
    out_b = np.zeros((max_masks, h, w), bool)
    valid = np.zeros(max_masks, bool)
    keep = min(n, max_masks)
    if keep:
        out_b[:keep] = binary_maps[:keep]
        valid[:keep] = True
        sm = seg_map.astype(np.int64)
        out_seg = np.where((sm >= 0) & (sm < keep), sm, -1).astype(np.int32)
    return out_seg, out_b, valid


class PrecomputedMaskSource:
    """Loads the reference's precomputed per-frame masks."""

    def __init__(self, masks_path: str, max_masks: int = 96):
        self.masks_path = masks_path
        self.max_masks = max_masks

    def get_masks(self, image: np.ndarray, frame_id: int):
        map_path = os.path.join(self.masks_path,
                                f"{frame_id:04d}_seg_map_default.npy")
        if not os.path.exists(map_path):
            print(f"No precomputed mask for frame {frame_id}")
            return None, None, np.zeros(self.max_masks, bool)
        seg_map = np.load(map_path)
        bmap_path = os.path.join(self.masks_path,
                                 f"{frame_id:04d}_bmap_default.npy")
        if os.path.exists(bmap_path):
            binary = np.load(bmap_path)
        else:
            # reconstruct binary maps from the seg map (mask_generator.py:188-190)
            n = int(seg_map.max()) + 1
            binary = np.stack([seg_map == i for i in range(n)]) if n > 0 \
                else np.zeros((0, *seg_map.shape), bool)
        seg, b, valid = pad_masks(seg_map, binary, self.max_masks)
        return jnp.asarray(seg), jnp.asarray(b), jnp.asarray(valid)

    def save_masks(self, seg_map: np.ndarray, binary_maps: np.ndarray,
                   frame_id: int) -> None:
        os.makedirs(self.masks_path, exist_ok=True)
        np.save(os.path.join(self.masks_path,
                             f"{frame_id:04d}_seg_map_default"), seg_map)
        np.save(os.path.join(self.masks_path,
                             f"{frame_id:04d}_bmap_default"), binary_maps)


class CallableMaskSource:
    """Wraps any fn(image, frame_id) -> (seg_map, binary_maps) numpy pair.
    Used for synthetic test scenes and GT-mask runs."""

    def __init__(self, fn, max_masks: int = 96):
        self.fn = fn
        self.max_masks = max_masks

    def get_masks(self, image, frame_id: int):
        out = self.fn(image, frame_id)
        if out is None:
            return None, None, np.zeros(self.max_masks, bool)
        seg_map, binary = out
        seg, b, valid = pad_masks(np.asarray(seg_map), np.asarray(binary),
                                  self.max_masks)
        return jnp.asarray(seg), jnp.asarray(b), jnp.asarray(valid)

    def get_masks_batch(self, images, frame_ids):
        """Loop fallback so the pipeline's sam_batch path is exercisable
        with recorded/synthetic sources (no device batching to win here)."""
        outs = [self.get_masks(img, fid)
                for img, fid in zip(images, frame_ids)]
        h, w = np.asarray(images[0]).shape[:2]
        segs, bs, vs = [], [], []
        for seg, b, valid in outs:
            if seg is None:
                segs.append(jnp.full((h, w), -1, jnp.int32))
                bs.append(jnp.zeros((self.max_masks, h, w), bool))
                vs.append(jnp.zeros((self.max_masks,), bool))
            else:
                segs.append(seg); bs.append(b); vs.append(valid)
        return jnp.stack(segs), jnp.stack(bs), jnp.stack(vs)


class RecordedEmbedder:
    """Embedder backed by a lookup: label -> unit vector. For tests and
    recorded-descriptor pipeline runs; mirrors the reference's
    use_gt_clips intent (the config flags exist but were never implemented
    there, ovo.yaml:23-24)."""

    def __init__(self, clip_dim: int, mask_label_fn, label_embeds: np.ndarray,
                 text_embeds: Optional[dict] = None):
        """mask_label_fn(image, fused_maps, valid) -> (M,) int labels;
        label_embeds: (L, D) unit rows; text_embeds: text -> (D,)."""
        self.clip_dim = clip_dim
        self.mask_label_fn = mask_label_fn
        self.label_embeds = np.asarray(label_embeds, np.float32)
        self.text_embeds = text_embeds or {}

    def embed_masks(self, image, fused_maps, valid):
        labels = self.mask_label_fn(image, np.asarray(fused_maps),
                                    np.asarray(valid))
        out = self.label_embeds[np.clip(labels, 0, len(self.label_embeds) - 1)]
        return jnp.asarray(out)

    def embed_text(self, texts):
        return jnp.asarray(np.stack([self.text_embeds[t] for t in texts]))

    def similarity(self, txt_embeds, ins_desc):
        from ..ops.similarity import clip_cosine_similarity

        return clip_cosine_similarity(txt_embeds, ins_desc)

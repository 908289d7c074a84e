"""Backend factories: build mask sources and embedders from the ``semantic``
config section (mirrors the reference's MaskGenerator / CLIPGenerator
construction, ovo.py:45-49)."""
from __future__ import annotations

import os
from typing import Any, Dict, Optional


def build_mask_source(semantic_cfg: Dict[str, Any],
                      scene_name: Optional[str] = None):
    sam_cfg = semantic_cfg.get("sam", {})
    max_masks = int(semantic_cfg.get("capacity", {}).get("n_masks", 96))
    if sam_cfg.get("precomputed", False):
        assert scene_name, "precomputed masks require a scene_name"
        path = os.path.join(sam_cfg["masks_base_path"], scene_name)
        from .data.masks import PrecomputedMaskSource

        return PrecomputedMaskSource(path, max_masks=max_masks)
    from .models.sam import build_sam_mask_source

    return build_sam_mask_source(sam_cfg, max_masks=max_masks)


def build_embedder(semantic_cfg: Dict[str, Any]):
    clip_cfg = semantic_cfg.get("clip", {})
    embed_type = clip_cfg.get("embed_type", "vanilla")
    from .models.clip import build_clip_embedder

    return build_clip_embedder(clip_cfg, embed_type)

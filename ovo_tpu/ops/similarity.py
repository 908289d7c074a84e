"""Embedding similarity + multi-crop CLIP fusion.

Parity targets: /root/reference/ovo/utils/clip_utils.py:10-48.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def clip_cosine_similarity(txt_embeds: Array, img_embeds: Array) -> Array:
    """(Q, D) x (N, D) -> (N, Q) plain dot products (both sides pre-normalized
    by the callers, clip_utils.py:16-19)."""
    return jax.lax.dot_general(
        img_embeds, txt_embeds.astype(img_embeds.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def siglip_similarity(txt_embeds: Array, img_embeds: Array,
                      logit_scale: Array, logit_bias: Array) -> Array:
    """SigLIP sigmoid similarity (clip_utils.py:10-14)."""
    logits = clip_cosine_similarity(txt_embeds, img_embeds)
    return jax.nn.sigmoid(logits * jnp.exp(logit_scale) + logit_bias)


def _normalize(x: Array) -> Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _cos(a: Array, b: Array) -> Array:
    return jnp.sum(_normalize(a) * _normalize(b), axis=-1)


def fuse_clips(clip_g: Array, clip_seg: Array, clip_bbox: Array,
               embed_type: str, w_masked: float, w_global: float) -> Array:
    """Multi-crop descriptor fusion (clip_utils.py:21-48): combine the
    global-image, masked-crop and bbox-crop CLIP vectors per segment.
    All inputs (N, D), pre-normalized. Returns (N, D)."""
    if embed_type in ("hovsg", "fixed_weights"):
        w_local = w_masked
        clip_l = _normalize(clip_seg * w_local + clip_bbox * (1.0 - w_local))
        if embed_type == "fixed_weights":
            wg = jnp.asarray(w_global)
            fused = _normalize(clip_g * wg + clip_l * (1.0 - wg))
        else:
            wg = jax.nn.softmax(_cos(clip_g, clip_l), axis=0)[:, None]
            fused = _normalize(clip_g * wg + clip_l * (1.0 - wg))
        return fused
    if embed_type == "adaptive_weights":
        w_local = (_cos(clip_seg, clip_bbox) * w_masked)[:, None]
        clip_l = _normalize(clip_seg * w_local + clip_bbox * (1.0 - w_local))
        wg = (_cos(clip_g, clip_l) * w_global)[:, None]
        return _normalize(clip_g * wg + clip_l * (1.0 - wg))
    if embed_type == "concept_fusion":
        wg = jax.nn.softmax(_cos(clip_g, clip_bbox), axis=0)[:, None]
        return _normalize(wg * clip_g + (1.0 - wg) * clip_bbox)
    # vanilla
    return clip_seg

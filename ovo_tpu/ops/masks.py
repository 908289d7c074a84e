"""Mask post-processing device ops.

The reference's mask NMS (segment_utils.py:195-259) is an O(N^2) *Python
double loop* computing pairwise intersections one at a time on GPU -- a
top-3 hot spot in its profile. Here the full pairwise intersection matrix is
ONE matmul on the MXU (masks flattened to (N, H*W) in bf16/f32), and all the
threshold logic is vectorized elementwise math. Semantics are matched
exactly, including the reference's quirks:

  - ``tril(diagonal=1)`` for the lower inner-overlap matrix (includes the
    superdiagonal -- replicated faithfully);
  - keep = (col-max of strict-upper IoU <= iou_thr) & score/inner gates;
  - the "no masks above score threshold -> keep top-3" fallback (the
    reference's version of this path indexes a 1D tensor as 2D and would
    raise; we implement the evident intent).

All functions are fixed-shape: N masks padded with a validity flag.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("iou_thr", "score_thr", "inner_thr"))
def mask_nms(masks: Array, scores: Array, valid: Array, *,
             iou_thr: float = 0.7, score_thr: float = 0.1,
             inner_thr: float = 0.2) -> Array:
    """Mask NMS. Args: masks (N, *spatial) bool in ANY consistent spatial
    order (intersections are flatten-order-agnostic); scores (N,); valid
    (N,). Returns keep (N,) bool over the ORIGINAL mask order."""
    N = masks.shape[0]
    neg = jnp.asarray(-jnp.inf, scores.dtype)
    s = jnp.where(valid, scores, neg)
    order = jnp.argsort(-s, stable=True)          # descending, stable
    s_ord = s[order]
    v_ord = valid[order]

    flat = masks.reshape(N, -1).astype(jnp.float32)
    flat_ord = flat[order]
    area = jnp.sum(flat_ord, axis=1)
    inter = jax.lax.dot_general(
        flat_ord, flat_ord, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (N, N) pairwise overlap
    union = area[:, None] + area[None, :] - inter
    pair_valid = v_ord[:, None] & v_ord[None, :]
    iou = jnp.where(pair_valid & (union > 0), inter / jnp.maximum(union, 1e-9), 0.0)

    safe_area = jnp.maximum(area, 1e-9)
    frac_r = inter / safe_area[:, None]            # inter / area_row
    frac_c = inter / safe_area[None, :]            # inter / area_col
    inner_val = 1.0 - frac_c * frac_r
    # The reference's two write branches ([i,j] when row-mask is dominated,
    # [j,i] in the mirror case, segment_utils.py:224-230) both reduce to the
    # same full-matrix condition on (row, col):
    inner = jnp.where((frac_r < 0.5) & (frac_c >= 0.85) & pair_valid,
                      inner_val, 0.0)

    rows = jnp.arange(N)
    strict_upper = rows[:, None] < rows[None, :]
    iou_max = jnp.max(jnp.where(strict_upper, iou, 0.0), axis=0)
    inner_u = jnp.max(jnp.where(strict_upper, inner, 0.0), axis=0)
    # reference: tril(inner, diagonal=1) -> rows >= cols - 1
    lower_incl_diag1 = rows[:, None] >= rows[None, :] - 1
    inner_l = jnp.max(jnp.where(lower_incl_diag1, inner, 0.0), axis=0)

    keep = iou_max <= iou_thr
    keep_conf = s_ord > score_thr
    keep_inner_u = inner_u <= 1.0 - inner_thr
    keep_inner_l = inner_l <= 1.0 - inner_thr

    # fallback: if nothing passes the score gate, keep the top-3 by score
    top3 = rows < 3
    keep_conf = jnp.where(jnp.any(keep_conf & v_ord), keep_conf, top3)
    keep_inner_u = jnp.where(jnp.any(keep_inner_u & v_ord), keep_inner_u, top3)
    keep_inner_l = jnp.where(jnp.any(keep_inner_l & v_ord), keep_inner_l, top3)

    keep_ord = keep & keep_conf & keep_inner_u & keep_inner_l & v_ord
    # scatter back to original order
    return jnp.zeros((N,), jnp.bool_).at[order].set(keep_ord)


@jax.jit
def masks_to_seg_map(masks: Array, stability: Array, valid: Array) -> Array:
    """Rasterize kept masks into a (H, W) int32 seg map, overlaps resolved in
    favor of the higher stability score (mask2segmap, segment_utils.py:12-27:
    masks sorted by stability descending, earlier mask wins overlapping
    pixels). Output values index the ORIGINAL mask axis; -1 = unassigned.
    """
    from .segment_mxu import table_lookup_int

    N = masks.shape[0]
    neg = jnp.asarray(-jnp.inf, stability.dtype)
    s = jnp.where(valid, stability, neg)
    rank = jnp.argsort(jnp.argsort(-s, stable=True))  # rank in stability order
    # per pixel: the covering mask with the smallest rank wins
    rank_map = jnp.where(masks & valid[:, None, None], rank[:, None, None], N)
    best = jnp.min(rank_map, axis=0)
    # invert rank -> original index; H*W-element lookup into an N-row table
    # runs on the MXU (a TPU gather here profiled at ~6 ms vs <1 ms)
    inv = jnp.argsort(-s, stable=True)  # inv[rank] = original index
    tbl = jnp.concatenate([inv.astype(jnp.int32), jnp.asarray([-1], jnp.int32)])
    idx = table_lookup_int(best.reshape(-1), tbl)
    return idx.reshape(best.shape)


def compact_masks(keep: Array, masks: Array, scores: Array,
                  stability: Array) -> Tuple[Array, Array, Array, Array]:
    """Stable-compact kept masks to the front of the padded axis. Returns
    (masks, scores, stability, valid) with kept entries first in original
    order -- the layout the association step expects."""
    N = masks.shape[0]
    order = jnp.argsort(~keep, stable=True)  # kept first, original order
    return (masks[order], scores[order], stability[order], keep[order])

"""Automatic mask generation: grid-prompted segmentation of a keyframe as a
fixed-shape device program.

Reference behavior: SAM2AutomaticMaskGenerator + OVO's masks_update/
mask2segmap post-processing (segment_utils.py:173-259,12-27; config
ovo.yaml: points_per_side 16, pred_iou 0.8, stability 0.95). The reference
decodes point prompts in host-looped batches and runs a Python O(N^2) NMS;
here the WHOLE pipeline -- encoder, 256 prompts x 3 masks, stability
scoring, box NMS, mask NMS, seg-map rasterization -- is jitted with padded
candidate axes:

  encode -> decode all P grid points (one batch) -> multimask (3P candidates)
  -> iou/stability gates -> greedy box NMS (fori_loop) -> top-C by score
  -> OVO mask NMS (MXU intersection matmul) -> top-M masks -> upsample to
  image res -> stability-ordered seg map.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.masks import mask_nms, masks_to_seg_map
from .model import SAMConfig, SAMModel

Array = jax.Array


def _bilinear_matrix(src: int, dst: int) -> np.ndarray:
    """(src, dst) sparse-as-dense bilinear interpolation matrix matching
    jax.image.resize's half-pixel convention. Lets mask upsampling run as
    two MXU matmuls instead of a gather-based resize."""
    scale = src / dst
    pos = (np.arange(dst) + 0.5) * scale - 0.5
    lo = np.floor(pos).astype(np.int64)
    w_hi = (pos - lo).astype(np.float32)
    lo_c = np.clip(lo, 0, src - 1)
    hi_c = np.clip(lo + 1, 0, src - 1)
    m = np.zeros((src, dst), np.float32)
    m[lo_c, np.arange(dst)] += 1.0 - w_hi
    m[hi_c, np.arange(dst)] += w_hi
    return m


def upsample_bilinear_matmul(x: Array, out_hw: Tuple[int, int],
                             mats: Optional[Tuple[Array, Array]] = None
                             ) -> Array:
    """(M, h, w) -> (M, H, W) bilinear via separable matmuls.
    precision=HIGHEST: the TPU default single-pass MXU mode has ~1e-3
    relative error, and mask-boundary pixels sit exactly where the
    interpolated logits cross the binarization threshold -- keep full f32
    for parity with the reference's f32 F.interpolate.
    ``mats`` overrides the per-axis matrices (SAM1's crop-composed path)."""
    h, w = x.shape[-2:]
    H, W = out_hw
    if mats is None:
        mh = jnp.asarray(_bilinear_matrix(h, H))
        mw = jnp.asarray(_bilinear_matrix(w, W))
    else:
        mh, mw = mats
    y = jnp.einsum("mhw,hH->mHw", x, mh,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("mHw,wW->mHW", y, mw,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def _sam1_upsample_matrix(src: int, full: int, crop: int, dst: int
                          ) -> np.ndarray:
    """(src, dst) matrix composing SAM1's two-stage mask upsampling along
    one axis: low-res logits (src) -> model input res (full), CROP to the
    un-padded extent (crop), -> original image res (dst). Matches the
    official postprocess_masks interpolate->crop->interpolate chain as a
    single matmul."""
    m1 = _bilinear_matrix(src, full)[:, :crop]         # (src, crop)
    m2 = _bilinear_matrix(crop, dst)                   # (crop, dst)
    return m1 @ m2


def upsample_bilinear_matmul_blocked(x: Array, out_hw: Tuple[int, int]
                                     ) -> Array:
    """(M, h, w, 2, 2, 2, 2) decoder-blocked logits (decode_masks
    blocked=True; pixel (4h+2i+p, 4w+2j+q) at index (h, w, i, j, p, q)) ->
    (M, H, W) raster, reading the blocked order directly by reshaping the
    interpolation WEIGHTS (source row 4h+2i+p == C-order flatten of
    (h, i, p)).

    NOTE kept as a tested utility, not wired into _amg_program: running the
    whole AMG tail on blocked logits measured SLOWER end-to-end -- XLA's
    layout assignment copies 8-D dot operands/outputs into exotic layouts
    (traced +3..+9 ms vs the single raster relayout; PERF.md 6e)."""
    M, h, w = x.shape[:3]
    H, W = out_hw
    mh = jnp.asarray(_bilinear_matrix(4 * h, H)).reshape(h, 2, 2, H)
    mw = jnp.asarray(_bilinear_matrix(4 * w, W)).reshape(w, 2, 2, W)
    y = jnp.einsum("mhwijpq,hipH->mwjqH", x, mh,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("mwjqH,wjqW->mHW", y, mw,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def mask_boxes_blocked(masks: Array) -> Array:
    """(N, h, w, 2, 2, 2, 2) bool in the decoder's blocked layout ->
    (N, 4) xyxy raster-pixel boxes; mask_boxes semantics with coordinate
    TENSORS built in blocked order (see upsample_bilinear_matmul_blocked
    note on why this stays a utility)."""
    N, h, w = masks.shape[:3]
    H, W = 4 * h, 4 * w
    rows = jnp.any(masks, axis=(2, 4, 6))          # (N, h, i, p)
    cols = jnp.any(masks, axis=(1, 3, 5))          # (N, w, j, q)
    two = jnp.arange(2)
    ridx = (4 * jnp.arange(h)[:, None, None] + 2 * two[None, :, None]
            + two[None, None, :])                  # (h, 2, 2) = 4h+2i+p
    cidx = (4 * jnp.arange(w)[:, None, None] + 2 * two[None, :, None]
            + two[None, None, :])                  # (w, 2, 2) = 4w+2j+q
    y0 = jnp.min(jnp.where(rows, ridx[None], H), axis=(1, 2, 3))
    y1 = jnp.max(jnp.where(rows, ridx[None], -1), axis=(1, 2, 3))
    x0 = jnp.min(jnp.where(cols, cidx[None], W), axis=(1, 2, 3))
    x1 = jnp.max(jnp.where(cols, cidx[None], -1), axis=(1, 2, 3))
    empty = ~jnp.any(rows, axis=(1, 2, 3))
    box = jnp.stack([x0, y0, x1, y1], axis=1)
    return jnp.where(empty[:, None], 0, box)


def grid_points(points_per_side: int) -> np.ndarray:
    """Normalized [0,1] grid point prompts (SAM AMG build_point_grid)."""
    offset = 1.0 / (2 * points_per_side)
    coords = np.linspace(offset, 1.0 - offset, points_per_side)
    gx, gy = np.meshgrid(coords, coords, indexing="xy")
    return np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float32)


def min_area_cells(min_area: float, valid_cells: int,
                   out_hw: Tuple[int, int]) -> float:
    """Reference min_mask_region_area units (original-res pixels,
    segment_utils.py sam_config) -> logit-res cell count for the
    whole-mask `area >` gate. The reference's operation is
    connected-component small-region removal at output resolution that
    never drops whole masks; this filter approximates it (documented in
    PARITY.md section 7) and at minimum must compare in the right units:
    one logit cell covers out_h*out_w/valid_cells original pixels."""
    if not min_area:
        return 0.0
    return min_area * valid_cells / float(out_hw[0] * out_hw[1])


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str
                         ) -> Tuple[np.ndarray, bool]:
    """Connected-component small-region removal / hole filling on one bool
    mask, matching segment_anything's cv2-based ``remove_small_regions``
    (8-connectivity) as consumed by the reference SAM1 AMG
    (/root/reference/ovo/utils/segment_utils.py:286). scipy.ndimage stands
    in for cv2.connectedComponentsWithStats (same labeling semantics; cv2
    is not in-image).

    mode="holes": fill background components smaller than area_thresh.
    mode="islands": drop foreground components smaller than area_thresh,
    keeping the largest component if ALL are small (a whole mask is never
    dropped). Returns (mask, changed)."""
    from scipy import ndimage

    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = np.logical_xor(correct_holes, mask)
    eight = np.ones((3, 3), bool)
    regions, n_labels = ndimage.label(working, structure=eight)
    if n_labels == 0:
        return mask, False
    sizes = np.bincount(regions.ravel(), minlength=n_labels + 1)[1:]
    small = np.nonzero(sizes < area_thresh)[0] + 1
    if small.size == 0:
        return mask, False
    if correct_holes:
        fill = np.concatenate([[0], small])
    else:
        fill = np.setdiff1d(np.arange(1, n_labels + 1), small)
        if fill.size == 0:  # keep the largest region
            fill = np.asarray([int(np.argmax(sizes)) + 1])
    return np.isin(regions, fill), True


def _np_greedy_box_nms(boxes: np.ndarray, scores: np.ndarray,
                       iou_thresh: float) -> np.ndarray:
    """Host-side torchvision-semantics greedy NMS (stable score order)."""
    n = boxes.shape[0]
    order = np.argsort(-scores, kind="stable")
    keep = np.ones(n, bool)
    area = (np.maximum(boxes[:, 2] - boxes[:, 0], 0)
            * np.maximum(boxes[:, 3] - boxes[:, 1], 0))
    for oi in range(n):
        i = order[oi]
        if not keep[i]:
            continue
        for oj in range(oi + 1, n):
            j = order[oj]
            if not keep[j]:
                continue
            x0 = max(boxes[i, 0], boxes[j, 0])
            y0 = max(boxes[i, 1], boxes[j, 1])
            x1 = min(boxes[i, 2], boxes[j, 2])
            y1 = min(boxes[i, 3], boxes[j, 3])
            inter = max(x1 - x0, 0) * max(y1 - y0, 0)
            union = area[i] + area[j] - inter
            if union > 0 and inter / union > iou_thresh:
                keep[j] = False
    return keep


def postprocess_small_regions_host(bmaps: np.ndarray, valid: np.ndarray,
                                   min_area: float, nms_thresh: float
                                   ) -> Tuple[np.ndarray, np.ndarray, bool]:
    """The reference SAM1 AMG's ``postprocess_small_regions`` (official
    segment_anything amg.py semantics, enabled by min_mask_region_area=100
    at /root/reference/ovo/utils/segment_utils.py:286): per mask, fill small
    holes then drop small islands at OUTPUT resolution, then de-duplicate
    with a box NMS that prefers unchanged masks (changed masks score 0).

    Host-side by design -- the reference runs this on CPU via cv2 too, and
    it is off on the SAM2 default path (min_mask_region_area=0 there).

    Returns (fixed bmaps, new valid, any_changed)."""
    bmaps = np.array(bmaps, dtype=bool, copy=True)
    valid = np.array(valid, dtype=bool, copy=True)
    idx = np.nonzero(valid)[0]
    if idx.size == 0:
        return bmaps, valid, False
    scores = np.ones(idx.size, np.float32)
    any_changed = False
    for k, i in enumerate(idx):
        m, ch_h = remove_small_regions(bmaps[i], min_area, "holes")
        m, ch_i = remove_small_regions(m, min_area, "islands")
        changed = ch_h or ch_i
        if changed:
            bmaps[i] = m
            scores[k] = 0.0   # prefer unchanged duplicates in the NMS
            any_changed = True
    if not any_changed:
        return bmaps, valid, False
    boxes = np.zeros((idx.size, 4), np.float32)
    for k, i in enumerate(idx):
        rows = np.any(bmaps[i], axis=1)
        cols = np.any(bmaps[i], axis=0)
        if rows.any():
            y = np.nonzero(rows)[0]
            x = np.nonzero(cols)[0]
            boxes[k] = [x[0], y[0], x[-1], y[-1]]
    keep = _np_greedy_box_nms(boxes, scores, nms_thresh)
    valid[idx[~keep]] = False
    bmaps &= valid[:, None, None]
    return bmaps, valid, True


def stability_score(logits: Array, mask_threshold: float, offset: float
                    ) -> Array:
    """IoU between the mask thresholded at +/- offset (SAM amg)."""
    hi = jnp.sum((logits > mask_threshold + offset).astype(jnp.float32),
                 axis=(-2, -1))
    lo = jnp.sum((logits > mask_threshold - offset).astype(jnp.float32),
                 axis=(-2, -1))
    return hi / jnp.maximum(lo, 1.0)


def mask_boxes(masks: Array) -> Array:
    """(N, H, W) bool -> (N, 4) xyxy boxes ([0,0,0,0] for empty)."""
    N, H, W = masks.shape
    rows = jnp.any(masks, axis=2)
    cols = jnp.any(masks, axis=1)
    ridx = jnp.arange(H)
    cidx = jnp.arange(W)
    y0 = jnp.min(jnp.where(rows, ridx, H), axis=1)
    y1 = jnp.max(jnp.where(rows, ridx, -1), axis=1)
    x0 = jnp.min(jnp.where(cols, cidx, W), axis=1)
    x1 = jnp.max(jnp.where(cols, cidx, -1), axis=1)
    empty = ~jnp.any(rows, axis=1)
    box = jnp.stack([x0, y0, x1, y1], axis=1)
    return jnp.where(empty[:, None], 0, box)


def greedy_box_nms(boxes: Array, scores: Array, valid: Array,
                   iou_thresh: float) -> Array:
    """torchvision-style greedy NMS, vectorized inner loop."""
    N = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf), stable=True)
    b = boxes[order].astype(jnp.float32)
    v = valid[order]
    area = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    x0 = jnp.maximum(b[:, None, 0], b[None, :, 0])
    y0 = jnp.maximum(b[:, None, 1], b[None, :, 1])
    x1 = jnp.minimum(b[:, None, 2], b[None, :, 2])
    y1 = jnp.minimum(b[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    def body(i, keep):
        sup = (iou[i] > iou_thresh) & (jnp.arange(N) > i) & keep[i]
        return keep & ~sup

    keep = jax.lax.fori_loop(0, N, body, v)
    return jnp.zeros((N,), bool).at[order].set(keep)


@jax.jit
def _reraster_program(bmaps: Array, stab: Array, valid: Array) -> Array:
    """Re-rasterize the seg map after the host small-region post-pass."""
    return masks_to_seg_map(bmaps, stab, valid)


class AutomaticMaskSource:
    """Mask-source interface (get_masks) backed by the SAM2-class model."""

    def __init__(self, model: SAMModel, points_per_side: int = 16,
                 pred_iou_thresh: float = 0.8,
                 stability_thresh: float = 0.95,
                 stability_offset: float = 1.0, mask_threshold: float = 0.0,
                 box_nms_thresh: float = 0.7, nms_iou_th: float = 0.8,
                 nms_score_th: float = 0.7, nms_inner_th: float = 0.5,
                 max_masks: int = 96, candidates: int = 256,
                 min_area: int = 0, gate_prompts: int = 128,
                 min_area_mode: str = "connected"):
        self.model = model
        self.points = jnp.asarray(grid_points(points_per_side))
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_thresh = stability_thresh
        self.stability_offset = stability_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.nms_iou_th = nms_iou_th
        self.nms_score_th = nms_score_th
        self.nms_inner_th = nms_inner_th
        self.max_masks = max_masks
        self.candidates = candidates
        self.min_area = min_area
        # "connected" (default) = the official postprocess_small_regions:
        # connected-component hole filling + island removal at output res,
        # host-side (the reference runs it on CPU via cv2 too). "fast" =
        # the in-program whole-mask area gate in rescaled logit units --
        # cheaper but drops small valid masks and never fills holes
        # (PARITY.md section 7).
        assert min_area_mode in ("connected", "fast")
        self.min_area_mode = min_area_mode
        # predicted-IoU prompt gate before the decoder's per-prompt upscale
        # tail (decode_masks top_prompts); 0/None disables. Kept >= the
        # downstream candidate cap / 3 so the NMS stages still see a full
        # candidate pool.
        self.gate_prompts = gate_prompts or None

    def _amg_kwargs(self, out_hw):
        return dict(
            pred_iou_thresh=self.pred_iou_thresh,
            stability_thresh=self.stability_thresh,
            stability_offset=self.stability_offset,
            mask_threshold=self.mask_threshold,
            box_nms_thresh=self.box_nms_thresh,
            nms_iou_th=self.nms_iou_th, nms_score_th=self.nms_score_th,
            nms_inner_th=self.nms_inner_th, max_masks=self.max_masks,
            candidates=self.candidates,
            # connected mode runs the official post-pass AFTER the program
            # (no in-program whole-mask gate: the official AMG never drops
            # whole masks for min_mask_region_area)
            min_area=(0 if self.min_area_mode == "connected"
                      else self.min_area),
            gate_prompts=self.gate_prompts, out_hw=out_hw)

    def _small_regions(self, seg, bmaps, valid, stab):
        """Apply the official small-region post-pass (host) and re-rasterize
        the seg map from the fixed masks. No-op unless masks changed."""
        bm, va, changed = postprocess_small_regions_host(
            np.asarray(bmaps), np.asarray(valid), self.min_area,
            self.box_nms_thresh)
        if not changed:
            return seg, bmaps, valid
        bmaps = jnp.asarray(bm)
        valid = jnp.asarray(va)
        seg = _reraster_program(bmaps, stab, valid)
        return seg, bmaps, valid

    def get_masks(self, image, frame_id: int = None):
        # NOTE: jnp.asarray keeps device arrays on device (no host round
        # trip); u8 frames normalize INSIDE the jitted program (fewer
        # dispatches)
        img = jnp.asarray(image)
        h, w = img.shape[:2]
        seg, bmaps, valid, stab = _amg_program(
            self.model.params, self.model.cfg, img, self.points,
            **self._amg_kwargs((h, w)))
        if self.min_area and self.min_area_mode == "connected":
            seg, bmaps, valid = self._small_regions(seg, bmaps, valid, stab)
        return seg, bmaps, valid

    def get_masks_batch(self, images, frame_ids=None):
        """Segment a micro-batch of keyframes in one program: masks are
        map-independent (SURVEY.md section 3.1 -- only the association step
        reads map state), so batching SAM across segment-keyframes keeps
        per-keyframe semantics while roughly halving per-op overheads.
        images: (B, H, W, 3) uint8 -> (seg (B,H,W), bmaps (B,M,H,W),
        valid (B,M))."""
        imgs = jnp.asarray(images)
        h, w = imgs.shape[1:3]
        fn = functools.partial(_amg_program, **self._amg_kwargs((h, w)))
        seg, bmaps, valid, stab = jax.vmap(
            fn, in_axes=(None, None, 0, None))(
            self.model.params, self.model.cfg, imgs, self.points)
        if self.min_area and self.min_area_mode == "connected":
            outs = [self._small_regions(seg[b], bmaps[b], valid[b], stab[b])
                    for b in range(seg.shape[0])]
            seg = jnp.stack([o[0] for o in outs])
            bmaps = jnp.stack([o[1] for o in outs])
            valid = jnp.stack([o[2] for o in outs])
        return seg, bmaps, valid


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "pred_iou_thresh", "stability_thresh",
                     "stability_offset", "mask_threshold", "box_nms_thresh",
                     "nms_iou_th", "nms_score_th", "nms_inner_th",
                     "max_masks", "candidates", "min_area", "gate_prompts",
                     "out_hw"))
def _amg_program(params, cfg: SAMConfig, image: Array, points: Array, *,
                 pred_iou_thresh, stability_thresh, stability_offset,
                 mask_threshold, box_nms_thresh, nms_iou_th, nms_score_th,
                 nms_inner_th, max_masks, candidates, min_area,
                 gate_prompts=None, out_hw: Tuple[int, int]):
    model = SAMModel(cfg, params)
    h_in, w_in = image.shape[:2]
    if image.dtype == jnp.uint8:
        # normalize INSIDE the program: the eager astype/divide outside
        # cost 1-2 extra device dispatches per keyframe (~0.23 ms each on
        # this tunneled runtime)
        image = image.astype(jnp.float32) / 255.0
    x = model.preprocess(image)
    image_embed, high_res = model.encode_image(x)
    # SAM1: grid prompts live in the original image's [0,1] box, which
    # occupies only the top-left (nh, nw) of the padded input square
    sx, sy = model.point_scale(h_in, w_in)
    pts = points if (sx, sy) == (1.0, 1.0) else (
        points * jnp.asarray([sx, sy], points.dtype))
    # multimask outputs only (SAM AMG multimask_output=True -> channels
    # 1:4); the decoder skips the single-mask channel's hypernet/einsum.
    # gate_prompts: only the top-C prompts by token-predicted IoU pay the
    # per-prompt upscale tail (decode_masks top_prompts)
    out = model.decode_grid(image_embed, high_res, pts,
                            mask_channels=(1, 2, 3),
                            top_prompts=gate_prompts)
    logits = out["masks"]                                # (P, 3, Hm, Wm)
    iou = out["iou"]
    P = logits.shape[0]
    Hm, Wm = logits.shape[-2:]
    logits = logits.reshape(P * 3, Hm, Wm)
    iou = iou.reshape(P * 3)
    logits_raw = logits        # unsuppressed: fed to the upsample matmuls
    if cfg.family == "sam1":
        # suppress the pad region FOR SCORING ONLY (official AMG crops at
        # full input res before any scoring; the square pad must not count
        # as mask area/stability). The upsample below keeps the raw logits:
        # its crop-composed matrices already exclude the pad, and the
        # official postprocess_masks interpolates the model's REAL
        # pad-region logits at the crop boundary -- feeding the sentinel
        # there would drag every edge-touching mask's last rows/cols to 0.
        nh, nw = model.resized_hw(h_in, w_in)
        s = cfg.image_size
        vh, vw = -(-nh * Hm // s), -(-nw * Wm // s)     # ceil at logit res
        row_ok = jnp.arange(Hm) < vh
        col_ok = jnp.arange(Wm) < vw
        logits = jnp.where(row_ok[None, :, None] & col_ok[None, None, :],
                           logits, mask_threshold - 1e4)
        area_gate = min_area_cells(min_area, vh * vw, out_hw)
    else:
        area_gate = min_area_cells(min_area, Hm * Wm, out_hw)

    stab = stability_score(logits, mask_threshold, stability_offset)
    masks = logits > mask_threshold
    area = jnp.sum(masks.astype(jnp.int32), axis=(1, 2))
    keep = ((iou > pred_iou_thresh) & (stab >= stability_thresh)
            & (area > area_gate))

    # keep top-C candidates by predicted iou (static axis for the NMS stages)
    score_order = jnp.argsort(-jnp.where(keep, iou, -jnp.inf), stable=True)
    sel = score_order[:candidates]
    masks_c = masks[sel]
    iou_c = iou[sel]
    stab_c = stab[sel]
    valid_c = keep[sel]

    boxes = mask_boxes(masks_c)
    valid_c = valid_c & greedy_box_nms(boxes, iou_c, valid_c, box_nms_thresh)

    # OVO's mask NMS with scores = stability * iou (segment_utils.py:181)
    nms_keep = mask_nms(masks_c, stab_c * iou_c, valid_c,
                        iou_thr=nms_iou_th, score_thr=nms_score_th,
                        inner_thr=nms_inner_th)
    valid_c = valid_c & nms_keep

    # final top-M by stability (mask2segmap sorts by stability descending,
    # segment_utils.py:13-14; overflow beyond M drops the least stable)
    m_order = jnp.argsort(-jnp.where(valid_c, stab_c, -jnp.inf), stable=True)
    m_sel = m_order[:max_masks]
    final_valid = valid_c[m_sel]
    final_stab = jnp.where(final_valid, stab_c[m_sel], -jnp.inf)

    # upsample kept masks to image resolution (bilinear on logits, as two
    # MXU matmuls -- gather-based resize is slow on TPU). Uses the RAW
    # (unsuppressed) logits: for SAM1 the composed crop matrices already
    # exclude the pad, and real boundary logits must feed the interpolation.
    lg = logits_raw[sel][m_sel]
    if cfg.family == "sam1":
        # compose the official interpolate(S) -> crop(nh, nw) ->
        # interpolate(out) chain into one matrix per axis
        s = cfg.image_size
        mats = (jnp.asarray(_sam1_upsample_matrix(Hm, s, nh, out_hw[0])),
                jnp.asarray(_sam1_upsample_matrix(Wm, s, nw, out_hw[1])))
        lg_up = upsample_bilinear_matmul(lg, out_hw, mats=mats)
    else:
        lg_up = upsample_bilinear_matmul(lg, out_hw)
    bmaps = (lg_up > mask_threshold) & final_valid[:, None, None]
    seg = masks_to_seg_map(bmaps, final_stab, final_valid)
    return seg, bmaps, final_valid, final_stab


def build_sam_mask_source(sam_cfg: Dict[str, Any], max_masks: int = 96
                          ) -> AutomaticMaskSource:
    """Factory from the reference's sam config section (segment_utils.py:
    269-309 parameter mapping)."""
    import os

    encoder = sam_cfg.get("sam_encoder", "hiera_l")
    ckpt_dir = sam_cfg.get("sam_ckpt_path", "")
    version = sam_cfg.get("sam_version", "2.1")
    sam1 = version == "" or encoder.startswith("vit")
    # reference model_cards (segment_utils.py:275): SAM1 files are
    # sam_vit_b_01ec64.pth etc. (empty sam_version), SAM2 sam2.1_hiera_*.pt
    cards = ({"vit_b": "vit_b_01ec64.pth", "vit_l": "vit_l_0b3195.pth",
              "vit_h": "vit_h_4b8939.pth", "vit_test": "vit_test.pth"}
             if sam1 else
             {"hiera_l": "hiera_large.pt", "hiera_t": "hiera_tiny.pt",
              "hiera_s": "hiera_small.pt", "hiera_b+": "hiera_base_plus.pt",
              "hiera_test": "hiera_test.pt"})
    ckpt = os.path.join(ckpt_dir, f"sam{version}_"
                        + cards.get(encoder, f"{encoder}.pt"))
    if os.path.exists(ckpt):
        from ..convert_sam import load_sam_checkpoint

        model = load_sam_checkpoint(encoder, ckpt)
    else:
        if ckpt_dir:
            print(f"[ovo_tpu] WARNING: SAM checkpoint {ckpt} not found; "
                  f"using random weights for {encoder}")
        model = SAMModel.random_init(
            encoder, image_size=sam_cfg.get("image_size", 1024))
    # family-dependent defaults mirror the reference's two sam_config
    # blocks (segment_utils.py:281-302): SAM1 stability 0.85 / min_area
    # 100; SAM2 stability 0.95 / min_area 0
    return AutomaticMaskSource(
        model,
        points_per_side=sam_cfg.get("points_per_side", 16),
        pred_iou_thresh=sam_cfg.get("pred_iou_th", 0.8),
        stability_thresh=sam_cfg.get("stability_score_th",
                                     0.85 if sam1 else 0.95),
        nms_iou_th=sam_cfg.get("nms_iou_th", 0.8),
        nms_score_th=sam_cfg.get("nms_score_th", 0.7),
        nms_inner_th=sam_cfg.get("nms_inner_th", 0.5),
        max_masks=max_masks,
        min_area=sam_cfg.get("min_mask_region_area", 100 if sam1 else 0),
        min_area_mode=sam_cfg.get("min_area_mode", "connected"),
        gate_prompts=sam_cfg.get("gate_prompts", 128))

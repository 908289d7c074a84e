"""The per-keyframe instance association step, as ONE jitted device program.

Reference behavior: OVO._match_and_track_instances + _track_objects +
_fuse_masks_with_same_ins_id (/root/reference/ovo/entities/ovo.py:182-324).
The reference runs a Python loop over masks with ``.item()`` host syncs per
mask; here the whole step is data-parallel XLA:

  frustum cull -> project map points -> depth-match -> per-mask majority vote
  (2D scatter-add vote matrix over the instance id space; argmax tie-break ==
  torch.mode's lowest-value rule) -> new-instance minting by prefix-sum ->
  point id write-back -> per-instance mask OR-fusion (segment scatter-max)
  -> top-k keyframe update.

No host round-trips, no dynamic shapes: masks are padded to ``M`` slots with
validity flags, instances live in a static id space of ``K``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import geometry as geo
from ..ops import segment_mxu
from . import instances as inst
from .instances import InstanceStore
from .map_state import MapState, _scatter_append

Array = jax.Array

# flat-index 4-column pixel gathers + sentinel scatter-set hit masks: the
# two 2M-row index ops dominate this program on TPU (PERF.md 6o)
_packed_pixel_table = geo.packed_pixel_table
hit_mask_scatter = geo.hit_mask_scatter


def _validated_seg_image(seg_map: Array, mask_valid: Array, M: int) -> Array:
    """Per-pixel validated seg map as f32: seg id if the id is in range and
    its mask slot is valid, else -1. Computed ONCE in pixel space (H*W) so
    the per-point side needs no small-table gathers (TPU gathers profiled at
    ~8 ns/row; the MXU lookup is ~30x cheaper at 2M rows)."""
    tbl = jnp.concatenate([
        jnp.where(mask_valid, jnp.arange(M, dtype=jnp.int32), -1),
        jnp.asarray([-1], jnp.int32)])
    idx = jnp.where((seg_map >= 0) & (seg_map < M), seg_map, M)
    out = segment_mxu.table_lookup_int(idx.reshape(-1), tbl)
    return out.reshape(seg_map.shape).astype(jnp.float32)


def _mask_slot_lookup(seg: Array, slot_values: Array, M: int) -> Array:
    """out[i] = slot_values[seg[i]] if seg[i] in [0, M) else -1, via the MXU
    (replaces a 2M-row gather into a 97-row table)."""
    tbl = jnp.concatenate([slot_values.astype(jnp.int32),
                           jnp.asarray([-1], jnp.int32)])
    idx = jnp.where((seg >= 0) & (seg < M), seg, M)
    return segment_mxu.table_lookup_int(idx, tbl)


def _vote_matmul(seg_row: Array, vote_col: Array, M: int, Kcap: int,
                 vary_axis: str | None = None) -> Array:
    """(N,) mask-slot ids x (N,) instance ids -> (M+1, Kcap+1) count matrix
    via chunked one-hot matmuls (exact: bf16 one-hots, f32 accumulation;
    counts < 2^24). ``vary_axis``: when called inside shard_map, the mesh
    axis the inputs vary over (the scan carry init must carry the same
    varying-axis type as the body output)."""
    N = seg_row.shape[0]
    CH = min(N, 2 ** 18)
    pad = (-N) % CH
    if pad:
        seg_row = jnp.concatenate([seg_row, jnp.full((pad,), M, jnp.int32)])
        vote_col = jnp.concatenate([vote_col,
                                    jnp.full((pad,), Kcap, jnp.int32)])

    def body(carry, x):
        s, v = x
        a = jax.nn.one_hot(s, M + 1, dtype=jnp.bfloat16)
        b = jax.nn.one_hot(v, Kcap + 1, dtype=jnp.bfloat16)
        return carry + jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), None

    init = jnp.zeros((M + 1, Kcap + 1), jnp.float32)
    if vary_axis is not None:
        init = jax.lax.pcast(init, (vary_axis,), to="varying")
    out, _ = jax.lax.scan(
        body, init,
        (seg_row.reshape(-1, CH), vote_col.reshape(-1, CH)))
    # padded rows landed in row M / col Kcap, which callers discard -- but
    # subtract the padding from that cell anyway to keep the matrix exact
    out = out.at[M, Kcap].add(-float(pad))
    return out.astype(jnp.int32)


def mask_decisions(votes_full: Array, mask_valid: Array, next_id: Array,
                   track_th: int, M: int, Kcap: int,
                   mint_cap: int | None = None
                   ) -> Tuple[Array, Array, Array, Array]:
    """The per-mask decision math shared by the single-chip and the
    point-sharded association paths (ovo.py:255-280 semantics): majority
    vote over assigned points, track/new gating at ``track_th``, new-id
    minting by prefix sum over ``next_id``, instance-capacity clipping.

    votes_full: (M+1, Kcap+1) count matrix -- row M collects dropped
    points, column Kcap collects unassigned points. ``Kcap`` may be an
    ``active_cols`` bucket smaller than the store capacity (every assigned
    id must then be < Kcap); ``mint_cap`` is the REAL store capacity that
    bounds minting (defaults to Kcap).

    Returns (ins_of_mask (M,), n_new (), n_dropped (), unassigned_cnt (M,)).
    """
    total = votes_full[:M].sum(axis=1).astype(jnp.int32)
    votes = votes_full[:M, :Kcap].astype(jnp.int32)
    assigned_cnt = votes.sum(axis=1)
    unassigned_cnt = total - assigned_cnt
    mode_id = jnp.argmax(votes, axis=1).astype(jnp.int32)  # ties -> lowest id

    observed = mask_valid & (total > track_th)
    case_track = observed & (assigned_cnt > track_th)
    case_new = observed & ~case_track & (unassigned_cnt > track_th)
    new_rank = jnp.cumsum(case_new.astype(jnp.int32)) - 1
    new_id = next_id + new_rank
    cap_ok = new_id < (Kcap if mint_cap is None else mint_cap)
    dropped = jnp.sum((case_new & ~cap_ok).astype(jnp.int32))
    case_new = case_new & cap_ok
    ins_of_mask = jnp.where(case_track, mode_id,
                            jnp.where(case_new, new_id, -1)).astype(jnp.int32)
    n_new = jnp.sum(case_new.astype(jnp.int32))
    return ins_of_mask, n_new, dropped, unassigned_cnt


class KeyframeMatch(NamedTuple):
    """Per-keyframe association output (padded to M mask slots)."""
    ins_ids: Array     # (M,) i32 instance id per kept slot, -1 = invalid
    fused_maps: Array  # (M, H, W) bool OR-fused binary masks
    keep: Array        # (M,) bool slot kept after top-k view filtering
    areas: Array       # (M,) i32 mask area used for top-k bookkeeping
    n_new: Array       # () i32 instances minted this keyframe
    n_matched: Array   # () i32 3D points matched to pixels this keyframe
    n_dropped_masks: Array  # () i32 masks lost to instance-capacity overflow


def mask_level_tail(store: InstanceStore, ins_of_mask: Array, n_new: Array,
                    dropped: Array, unassigned_cnt: Array, seg_map: Array,
                    binary_maps: Array, kf_id: Array, n_matched: Array, *,
                    unbounded_top_k: bool = True
                    ) -> Tuple[InstanceStore, KeyframeMatch]:
    """The mask-level (M-sized) half of association shared by the
    single-chip program and the point-sharded path (ovo.py:284-324):
    instance minting, per-instance mask OR-fusion, area bookkeeping, top-k
    keyframe update, and the KeyframeMatch assembly. Point-sized work never
    enters here, so the point-sharded path can run it replicated."""
    M = binary_maps.shape[0]
    store = inst.mint_instances(store, n_new)

    has_ins = ins_of_mask >= 0
    same = (ins_of_mask[:, None] == ins_of_mask[None, :]) & has_ins[:, None] \
        & has_ins[None, :]
    first_idx = jnp.argmax(same, axis=1).astype(jnp.int32)  # min slot w/ id
    keep_slot = has_ins & (first_idx == jnp.arange(M))
    group_size = jnp.sum(same, axis=1)

    # OR-fuse binary maps into the first slot of each group (one MXU matmul).
    # segment_or takes the (M, Hr, Wr) maps directly: reshaping the 1-bit
    # tiled pred tensor to (M, Hr*Wr) and back was two ~1 ms bit-repacking
    # relayouts per keyframe (traced), while dot_general contracts over M
    # with the spatial dims left in place.
    seg_dest = jnp.where(has_ins, first_idx, M)
    fused_maps = segment_mxu.segment_or(seg_dest, binary_maps, M)

    # areas: single mask -> seg-map area (what _track_objects used);
    # fused group -> OR-fused binary area (what the fuse step updates to)
    seg_flat = seg_map.reshape(-1)
    seg_area = segment_mxu.histogram(
        jnp.where(seg_flat >= 0, seg_flat, M), M).astype(jnp.int32)
    fused_area = jnp.sum(fused_maps.astype(jnp.int32), axis=(1, 2))
    areas = jnp.where(group_size > 1, fused_area, seg_area).astype(jnp.int32)

    # ---- top-k keyframe update + gating ----
    store = inst.add_top_kf(store, ins_of_mask, kf_id, areas, keep_slot)
    if unbounded_top_k:
        keep = keep_slot
    else:
        keep = keep_slot & inst.is_top_kf(store, ins_of_mask, kf_id)

    # diagnostic: unassigned matched points folded into each group's slot
    grp_unassigned = jnp.zeros((M,), jnp.int32).at[seg_dest].add(
        unassigned_cnt, mode="drop")
    store = inst.add_matched_points(store, ins_of_mask, grp_unassigned,
                                    keep_slot)

    out = KeyframeMatch(
        ins_ids=jnp.where(keep, ins_of_mask, -1),
        fused_maps=fused_maps,
        keep=keep,
        areas=areas,
        n_new=n_new,
        n_matched=n_matched,
        n_dropped_masks=dropped,
    )
    return store, out


@functools.partial(
    jax.jit,
    static_argnames=("match_distance_th", "track_th", "use_depth_filter",
                     "unbounded_top_k", "rgb_depth_ratio", "active_rows",
                     "active_cols"),
    donate_argnums=(0, 1))  # map/instance buffers update in place on TPU
def associate_keyframe(
    map_state: MapState,
    store: InstanceStore,
    seg_map: Array,        # (Hr, Wr) i32 in [-1, M)
    binary_maps: Array,    # (M, Hr, Wr) bool
    mask_valid: Array,     # (M,) bool
    depth: Array,          # (h, w) f32
    c2w: Array,            # (4, 4)
    K: Array,              # (3, 3) depth-resolution intrinsics
    kf_id: Array,          # () i32
    *,
    match_distance_th: float = 0.05,
    track_th: int = 100,
    use_depth_filter: bool = True,
    unbounded_top_k: bool = True,
    rgb_depth_ratio: Tuple[float, float, int] | None = None,
    active_rows: int | None = None,
    active_cols: int | None = None,
) -> Tuple[MapState, InstanceStore, KeyframeMatch]:
    """One-program per-keyframe association (see module docstring).

    DONATION CONTRACT: ``map_state`` and ``store`` are donated -- on TPU
    their buffers are reused for the outputs and the INPUT pytrees are
    invalid after the call. Callers must treat them as consumed and use the
    returned state; pass ``jax.tree_util.tree_map(jnp.copy, x)`` to keep an
    input alive. CPU runs ignore donation, so only real-TPU use catches
    violations.

    ``active_rows``: static bucket bounding the rows the per-point ops
    touch. Points are stored contiguously in [0, count) (appends and the
    LC rebuild both preserve this), so every gather/scatter/vote runs on
    ``points[:active_rows]`` -- the per-keyframe cost scales with the
    OCCUPIED bucket, not the allocated capacity (PERF.md 6p). CALLER
    CONTRACT: active_rows >= count (bit-exactness vs the full program is
    pinned by tests/test_association.py; violating the bound silently
    drops valid points from association).
    """
    M = binary_maps.shape[0]
    Kcap = store.capacity
    AR = (active_rows if active_rows is not None
          and active_rows < map_state.capacity else None)
    points = map_state.points if AR is None else map_state.points[:AR]
    obj_full = map_state.obj_ids
    obj = obj_full if AR is None else obj_full[:AR]
    row_valid = (map_state.valid_mask() if AR is None
                 else jnp.arange(AR) < map_state.count)

    # ---- geometry: cull + project + depth match (ovo.py:204-222) ----
    seg_img = _validated_seg_image(seg_map, mask_valid, M)  # pixel space
    corners = geo.compute_camera_frustum_corners(depth, c2w, K)
    in_frustum = geo.points_in_frustum(points, corners, valid=row_valid)
    depth_m = geo.depth_filter(depth) if use_depth_filter else depth

    h, w = depth.shape
    uv, z = geo.project_points(points, K, jnp.linalg.inv(c2w))
    in_plane = ((uv[:, 0] >= 0) & (uv[:, 0] < w) &
                (uv[:, 1] >= 0) & (uv[:, 1] < h))
    uc = jnp.clip(uv[:, 0], 0, w - 1)
    vc = jnp.clip(uv[:, 1], 0, h - 1)

    # RGB/depth resolution remap (ovo.py:218-221): depth-res pixel ->
    # RGB-res pixel of the (higher-resolution) segmentation map.
    flat_px = vc * w + uc
    if rgb_depth_ratio is None:
        # one packed gather: filtered depth + validated seg id
        packed = _packed_pixel_table(depth_m, seg_img)
        g = packed[flat_px]
        d_m, seg_pt = g[:, 0], g[:, 1].astype(jnp.int32)
    else:
        d_m = _packed_pixel_table(depth_m)[flat_px, 0]
        r_h, r_w, crop_edge = rgb_depth_ratio
        u2 = ((uc + crop_edge).astype(jnp.float32) * r_w).astype(jnp.int32)
        v2 = ((vc + crop_edge).astype(jnp.float32) * r_h).astype(jnp.int32)
        Hr, Wr = seg_map.shape
        u2 = jnp.clip(u2, 0, Wr - 1)
        v2 = jnp.clip(v2, 0, Hr - 1)
        seg_pt = _packed_pixel_table(seg_img)[v2 * Wr + u2, 0].astype(
            jnp.int32)

    matched = (in_frustum & in_plane
               & (jnp.abs(z - d_m) < match_distance_th) & (d_m != 0))
    seg = jnp.where(matched, seg_pt, -1)

    # ---- per-mask vote counts (replaces the _track_objects loop) ----
    # One-hot matmuls on the MXU instead of 2M-element scatter-adds (TPU
    # scatters serialize; the dense (M+1)x(K+1) vote matrix is tiny).
    Kv = (active_cols if active_cols is not None and active_cols < Kcap
          else Kcap)
    seg_row = jnp.where(seg >= 0, seg, M)  # M = dropped
    assigned = obj >= 0
    vote_col = jnp.where(assigned & (seg >= 0), jnp.clip(obj, 0, Kv - 1), Kv)
    votes_full = _vote_matmul(seg_row, vote_col, M, Kv)  # (M+1, Kv+1) i32
    # ---- decide each mask's instance (ovo.py:255-280) ----
    ins_of_mask, n_new, dropped, unassigned_cnt = mask_decisions(
        votes_full, mask_valid, store.next_id, track_th, M, Kv,
        mint_cap=Kcap)

    # ---- write instance ids back to unassigned matched points ----
    point_ins = _mask_slot_lookup(seg, ins_of_mask, M)   # MXU, not gather
    update = (~assigned) & (point_ins >= 0)
    new_obj = jnp.where(update, point_ins, obj)
    if AR is not None:
        new_obj = jax.lax.dynamic_update_slice(obj_full, new_obj, (0,))
    map_state = map_state._replace(obj_ids=new_obj)

    # ---- mask-level tail: mint + fuse + areas + top-k (ovo.py:284-324) ----
    store, out = mask_level_tail(
        store, ins_of_mask, n_new, dropped, unassigned_cnt, seg_map,
        binary_maps, kf_id, jnp.sum(matched.astype(jnp.int32)),
        unbounded_top_k=unbounded_top_k)
    return map_state, store, out


@functools.partial(
    jax.jit, static_argnames=("unbounded_top_k",), donate_argnums=(0,))
def mask_tail_program(store: InstanceStore, ins_of_mask: Array, n_new: Array,
                      dropped: Array, unassigned_cnt: Array, seg_map: Array,
                      binary_maps: Array, kf_id: Array, n_matched: Array, *,
                      unbounded_top_k: bool = True
                      ) -> Tuple[InstanceStore, KeyframeMatch]:
    """Standalone jitted mask_level_tail for the point-sharded association
    path (parallel/shard.py), which runs the point-sized half under
    shard_map and this replicated half separately.

    DONATION CONTRACT: ``store`` is donated (consumed); see
    associate_keyframe."""
    return mask_level_tail(store, ins_of_mask, n_new, dropped, unassigned_cnt,
                           seg_map, binary_maps, kf_id, n_matched,
                           unbounded_top_k=unbounded_top_k)


@functools.partial(
    jax.jit,
    static_argnames=("match_distance_th", "track_th", "use_depth_filter",
                     "unbounded_top_k", "rgb_depth_ratio", "insert_match_th",
                     "k_pooling", "downscale", "active_rows",
                     "active_cols"),
    donate_argnums=(0, 1))  # map/instance buffers update in place on TPU
def associate_and_insert_keyframe(
    map_state: MapState,
    store: InstanceStore,
    seg_map: Array,
    binary_maps: Array,
    mask_valid: Array,
    image: Array,          # (h, w, 3) u8, or (h//ds, w//ds, 3) pre-subsampled
    depth: Array,
    c2w: Array,
    K: Array,
    kf_id: Array,
    *,
    match_distance_th: float = 0.05,
    track_th: int = 100,
    use_depth_filter: bool = True,
    unbounded_top_k: bool = True,
    rgb_depth_ratio: Tuple[float, float, int] | None = None,
    insert_match_th: float = 0.03,
    k_pooling: int = 3,
    downscale: int = 2,
    active_rows: int | None = None,
    active_cols: int | None = None,
) -> Tuple[MapState, InstanceStore, KeyframeMatch]:
    """Fused association + vanilla map insert for frames on both cadences.

    ONE program: the w2c projection of the 2M-point map and the per-point
    pixel gathers are computed once and shared (they dominate the
    association cost on TPU), and the dispatch/sync overhead is paid once.

    DONATION CONTRACT: ``map_state`` and ``store`` are donated (consumed);
    see associate_keyframe.

    ORDERING: exactly the two-step map() -> associate_keyframe() flow of
    the reference pipeline (ovomapping.py:149-164) -- a keyframe's own
    freshly unprojected points participate in its association votes and
    receive instance ids. The insert decision is computed from the
    PRE-insert map (as map_insert_frame does), then the inserted points'
    vote contribution is added explicitly: they are always unassigned, so
    their matched rows add to the per-mask unassigned counts (one
    histogram), and their ids come from the same mask->instance lookup as
    the write-back. tests/test_association.py pins bit-exact equality with
    the two-step flow.

    ``active_rows``: static occupied-bucket bound for the per-point ops
    (see associate_keyframe; caller guarantees active_rows >= count;
    appends still go to the full buffer, but the NEXT call's active_rows
    must cover the grown count).

    ``active_cols``: static bucket bounding the vote matrix's instance
    axis -- the one-hot vote matmul cost scales with it (a 1025-column
    matrix for ~100 live instances is ~8x wasted MXU work). CALLER
    CONTRACT: active_cols >= store.next_id at call time (so every
    assigned point id fits a column); minted ids may exceed the bucket
    within the call, so the NEXT call's bucket must cover the new
    next_id. Results are bit-identical to the unbucketed program
    (tests/test_association.py).
    """
    M = binary_maps.shape[0]
    Kcap = store.capacity
    AR = (active_rows if active_rows is not None
          and active_rows < map_state.capacity else None)
    points = map_state.points if AR is None else map_state.points[:AR]
    obj_full = map_state.obj_ids
    obj = obj_full if AR is None else obj_full[:AR]
    row_valid = (map_state.valid_mask() if AR is None
                 else jnp.arange(AR) < map_state.count)
    h, w = depth.shape

    # ---- pixel-space tables (cheap: H*W work, not N work) ----
    depth_m = geo.depth_filter(depth) if use_depth_filter else depth
    seg_img = _validated_seg_image(seg_map, mask_valid, M)  # (Hr, Wr) f32

    # ---- shared geometry: one projection + ONE packed gather ----
    corners = geo.compute_camera_frustum_corners(depth, c2w, K)
    in_frustum = geo.points_in_frustum(points, corners, valid=row_valid)
    w2c = jnp.linalg.inv(c2w)
    uv, z = geo.project_points(points, K, w2c)
    in_plane = ((uv[:, 0] >= 0) & (uv[:, 0] < w) &
                (uv[:, 1] >= 0) & (uv[:, 1] < h))
    uc = jnp.clip(uv[:, 0], 0, w - 1)
    vc = jnp.clip(uv[:, 1], 0, h - 1)
    flat_px = vc * w + uc        # flat 1-D pixel index (cheapest gather form)

    if rgb_depth_ratio is None:
        # RGB == depth resolution: fold the seg map into the SAME gather as
        # the depth channels (ids <= M are exact in f32)
        packed = _packed_pixel_table(depth, depth_m, seg_img)
        g = packed[flat_px]                              # one 2M-row gather
        d_raw, d_m, seg_pt = g[:, 0], g[:, 1], g[:, 2].astype(jnp.int32)
    else:
        packed = _packed_pixel_table(depth, depth_m)
        g = packed[flat_px]
        d_raw, d_m = g[:, 0], g[:, 1]
        r_h, r_w, crop_edge = rgb_depth_ratio
        u2 = ((uc + crop_edge).astype(jnp.float32) * r_w).astype(jnp.int32)
        v2 = ((vc + crop_edge).astype(jnp.float32) * r_h).astype(jnp.int32)
        Hr, Wr = seg_map.shape
        u2 = jnp.clip(u2, 0, Wr - 1)
        v2 = jnp.clip(v2, 0, Hr - 1)
        seg_tbl = _packed_pixel_table(seg_img)
        seg_pt = seg_tbl[v2 * Wr + u2, 0].astype(jnp.int32)

    base = in_frustum & in_plane
    matched = base & (jnp.abs(z - d_m) < match_distance_th) & (d_m != 0)
    ins_matched = base & (jnp.abs(z - d_raw) < insert_match_th) & (d_raw != 0)
    seg = jnp.where(matched, seg_pt, -1)

    # ---- insert decision (map_state.map_insert_frame semantics against
    # the PRE-insert map, reusing the shared match) ----
    # Unconditional dedup + select: lax.cond shuttles the big carried
    # buffers through the conditional (profiled at ~20 ms of copies); the
    # dedup math itself is ~2 ms, so compute it always and select.
    hits = hit_mask_scatter(flat_px, ins_matched, h * w).reshape(h, w)
    have_map = map_state.count > 0
    if downscale > 1:
        # subsample fused into the erode window (max_pool_erode stride):
        # the full-res eroded mask never materializes, and the raster
        # subsamples go through reshape+unit-slice instead of strided
        # slices (traced ~6 ms/keyframe cheaper together)
        depth_ds = geo.subsample2d(depth, downscale)
        # colors: callers may pass ``image`` ALREADY subsampled to the
        # insert grid (h//ds, w//ds, 3) -- the host slices image[::ds,::ds]
        # during H2D staging for free, killing a ~2.4 ms/keyframe u8
        # (8,128)(4,1) relayout chain the on-device subsample costs
        # (PERF.md 6w; an i32 round-trip to dodge the u8 relayout was
        # tried earlier and reverted -- XLA sinks the convert below the
        # reshape). Full-res images keep the device-side fallback.
        if image.shape[0] == h // downscale:
            image_ds = image
        else:
            image_ds = geo.subsample2d(image, downscale)
        ins_mask = jnp.where(
            have_map,
            geo.max_pool_erode((depth > 0) & ~hits, k_pooling,
                               stride=downscale),
            depth_ds > 0)
        hh, ww = ins_mask.shape
        vg = (jnp.arange(hh, dtype=jnp.float32) * downscale)[:, None]
        ug = (jnp.arange(ww, dtype=jnp.float32) * downscale)[None, :]
        x = (ug - K[0, 2]) * depth_ds / K[0, 0]
        y = (vg - K[1, 2]) * depth_ds / K[1, 1]
        cam = jnp.stack([x, y, depth_ds], axis=-1).reshape(-1, 3)
        new_pts = geo.transform_points(c2w, cam)
    else:
        image_ds = image
        ins_mask = jnp.where(
            have_map,
            geo.max_pool_erode((depth > 0) & ~hits, k_pooling),
            depth > 0)
        new_pts = geo.unproject_depth(depth, K, c2w)

    # ---- self-votes: the freshly inserted points participate in this
    # keyframe's association, exactly as in the two-step flow where map()
    # runs first (ovomapping.py:149-164). They are all unassigned, so
    # their matched rows contribute only to the per-mask unassigned
    # counts -- one extra (H/ds * W/ds)-row projection + packed gather +
    # histogram, ~1/ds^2 of the map-side cost. ----
    flat_ins = ins_mask.reshape(-1)
    rank = jnp.cumsum(flat_ins.astype(jnp.int32)) - 1
    inserted = flat_ins & (map_state.count + rank < map_state.capacity)
    in_frustum_n = geo.points_in_frustum(new_pts, corners, valid=inserted)
    uv_n, z_n = geo.project_points(new_pts, K, w2c)
    in_plane_n = ((uv_n[:, 0] >= 0) & (uv_n[:, 0] < w) &
                  (uv_n[:, 1] >= 0) & (uv_n[:, 1] < h))
    if rgb_depth_ratio is None:
        # The new points unproject from THIS camera's strided pixel grid,
        # so round(project(unproject(u, v, z))) == (u, v): the projected
        # pixel differs from the grid pixel by the f32 inverse/transform
        # round-trip error (~1e-3 px at metric scene scale) and
        # project_points rounds to nearest, leaving a >= 0.49 px guard
        # band. The per-point pixel values therefore read as a strided
        # SUBSAMPLE of the pixel tables -- deleting a 204k-row gather
        # (traced 1.05 ms/keyframe). z_n stays the PROJECTED z so the
        # |z - d| threshold compares bit-identically to the two-step flow.
        ds = downscale if downscale > 1 else 1
        d_m_n = (geo.subsample2d(depth_m, ds) if ds > 1
                 else depth_m).reshape(-1)
        seg_pt_n = (geo.subsample2d(seg_img, ds) if ds > 1
                    else seg_img).reshape(-1).astype(jnp.int32)
    else:
        ucn = jnp.clip(uv_n[:, 0], 0, w - 1)
        vcn = jnp.clip(uv_n[:, 1], 0, h - 1)
        g_n = packed[vcn * w + ucn]
        d_m_n = g_n[:, 1]
        r_h, r_w, crop_edge = rgb_depth_ratio
        u2n = ((ucn + crop_edge).astype(jnp.float32) * r_w).astype(jnp.int32)
        v2n = ((vcn + crop_edge).astype(jnp.float32) * r_h).astype(jnp.int32)
        Hr, Wr = seg_map.shape
        u2n = jnp.clip(u2n, 0, Wr - 1)
        v2n = jnp.clip(v2n, 0, Hr - 1)
        seg_pt_n = seg_tbl[v2n * Wr + u2n, 0].astype(jnp.int32)
    matched_n = (in_frustum_n & in_plane_n
                 & (jnp.abs(z_n - d_m_n) < match_distance_th) & (d_m_n != 0))
    seg_n = jnp.where(matched_n, seg_pt_n, -1)
    hist_n = segment_mxu.histogram(
        jnp.where(seg_n >= 0, seg_n, M), M + 1).astype(jnp.int32)

    # ---- votes: map points + the frame's own inserted points ----
    # active_cols bounds the vote matrix's instance axis (the one-hot
    # matmul cost scales with it); caller guarantees every assigned id
    # < active_cols (see docstring)
    Kv = (active_cols if active_cols is not None and active_cols < Kcap
          else Kcap)
    seg_row = jnp.where(seg >= 0, seg, M)
    assigned = obj >= 0
    vote_col = jnp.where(assigned & (seg >= 0), jnp.clip(obj, 0, Kv - 1),
                         Kv)
    votes_full = _vote_matmul(seg_row, vote_col, M, Kv)
    votes_full = votes_full.at[:, Kv].add(hist_n)  # (M+1,) tiny update
    ins_of_mask, n_new, dropped, unassigned_cnt = mask_decisions(
        votes_full, mask_valid, store.next_id, track_th, M, Kv,
        mint_cap=Kcap)

    point_ins = _mask_slot_lookup(seg, ins_of_mask, M)   # MXU, not gather
    update = (~assigned) & (point_ins >= 0)
    new_obj = jnp.where(update, point_ins, obj)
    if AR is not None:
        new_obj = jax.lax.dynamic_update_slice(obj_full, new_obj, (0,))
    map_state = map_state._replace(obj_ids=new_obj)
    obj_n = _mask_slot_lookup(seg_n, ins_of_mask, M)     # ids for new points
    n_matched = (jnp.sum(matched.astype(jnp.int32))
                 + jnp.sum(matched_n.astype(jnp.int32)))
    store, out = mask_level_tail(
        store, ins_of_mask, n_new, dropped, unassigned_cnt, seg_map,
        binary_maps, kf_id, n_matched, unbounded_top_k=unbounded_top_k)

    map_state = _scatter_append(map_state, new_pts,
                                image_ds.reshape(-1, 3),
                                flat_ins, obj_vals=obj_n)
    return map_state, store, out

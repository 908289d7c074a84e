"""Fixed-capacity device point map + the GT-pose ("vanilla") mapper step.

Reference behavior: /root/reference/ovo/slam/vanilla_mapper.py. The reference
grows tensors with ``torch.vstack`` every mapping step; on TPU the map lives
in preallocated HBM buffers of capacity ``n_points`` with a valid ``count``,
and a mapping step is ONE jitted program:

  reproject existing map -> suppress matched pixels -> erode -> downscale ->
  unproject surviving depth -> scatter-append points/ids/colors.

Appending a dynamic number of points into static buffers uses a prefix-sum
over the new-pixel mask to compute scatter destinations; overflow beyond
capacity is dropped (mode="drop") and reported via the returned count.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import geometry as geo

Array = jax.Array


class MapState(NamedTuple):
    points: Array      # (N, 3) f32 world coordinates
    point_ids: Array   # (N,) i32 stable ids (monotonic, survive pruning)
    obj_ids: Array     # (N,) i32 instance id per point, -1 = unassigned
    colors: Array      # (N, 3) u8
    count: Array       # () i32 number of valid entries
    next_point_id: Array  # () i32

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def valid_mask(self) -> Array:
        return jnp.arange(self.capacity) < self.count


def init_map_state(n_points: int) -> MapState:
    return MapState(
        points=jnp.zeros((n_points, 3), jnp.float32),
        point_ids=jnp.full((n_points,), -1, jnp.int32),
        obj_ids=jnp.full((n_points,), -1, jnp.int32),
        colors=jnp.zeros((n_points, 3), jnp.uint8),
        count=jnp.zeros((), jnp.int32),
        next_point_id=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit,
                   static_argnames=("k_pooling", "downscale", "match_th"),
                   donate_argnums=(0,))
def map_insert_frame(state: MapState, image: Array, depth: Array, c2w: Array,
                     K: Array, *, k_pooling: int = 3, downscale: int = 2,
                     match_th: float = 0.03) -> MapState:
    """One vanilla mapping step (vanilla_mapper.py:46-85), fully on device.

    DONATION CONTRACT: ``state`` is donated -- on TPU its buffers back the
    returned state and the input is invalid after the call; pass
    ``jax.tree_util.tree_map(jnp.copy, state)`` to keep it. CPU ignores
    donation, so only real-TPU use catches violations.

    Args:
      image: (H, W, 3) uint8 RGB at depth resolution.
      depth: (H, W) f32 metric depth (0 = invalid).
      c2w:   (4, 4) camera-to-world.
      K:     (3, 3) intrinsics at depth resolution.
    """
    mask = depth > 0

    # Suppress pixels already explained by the map (reprojection dedup).
    def dedup(mask):
        corners = geo.compute_camera_frustum_corners(depth, c2w, K)
        in_frustum = geo.points_in_frustum(state.points, corners,
                                           valid=state.valid_mask())
        matched, uv = geo.match_points_to_depth(
            depth, jnp.linalg.inv(c2w), state.points, K, match_th,
            valid=in_frustum)
        # sentinel scatter-SET (order-independent: every write is 1) --
        # ~2x cheaper than scatter-max at 2M rows (geo.hit_mask_scatter)
        hh, ww = depth.shape
        hits = geo.hit_mask_scatter(uv[:, 1] * ww + uv[:, 0], matched,
                                    hh * ww).reshape(hh, ww)
        mask_new = mask & ~hits
        # subsample fused into the erode window (max_pool_erode stride)
        return geo.max_pool_erode(mask_new, k_pooling, stride=downscale)

    mask = jax.lax.cond(state.count > 0, dedup,
                        lambda m: geo.subsample2d(m, downscale), mask)

    if downscale > 1:
        depth_ds = geo.subsample2d(depth, downscale)
        image_ds = geo.subsample2d(image, downscale)
        K_ds = jnp.asarray(
            [[K[0, 0], 0.0, K[0, 2]], [0.0, K[1, 1], K[1, 2]], [0.0, 0.0, 1.0]])
        # NOTE: like the reference, pixel coordinates keep their ORIGINAL
        # (full-res) indices -- the reference slices the meshgrid, it does not
        # rescale intrinsics. Reproduce by unprojecting with original K over
        # strided pixel coords.
        h, w = mask.shape
        v = (jnp.arange(h, dtype=jnp.float32) * downscale)[:, None]
        u = (jnp.arange(w, dtype=jnp.float32) * downscale)[None, :]
        x = (u - K[0, 2]) * depth_ds / K[0, 0]
        y = (v - K[1, 2]) * depth_ds / K[1, 1]
        cam = jnp.stack([x, y, depth_ds], axis=-1).reshape(-1, 3)
        points = geo.transform_points(c2w, cam)
        del K_ds
    else:
        image_ds = image
        points = geo.unproject_depth(depth, K, c2w)

    flat_mask = mask.reshape(-1)
    colors = image_ds.reshape(-1, 3)
    return _scatter_append(state, points, colors, flat_mask)


def _scatter_append(state: MapState, points: Array, colors: Array,
                    new_mask: Array, obj_vals: Array | None = None
                    ) -> MapState:
    """Append points[new_mask] (row-major order, same as the reference's
    boolean indexing) into the fixed buffers at offset ``count``.

    ``obj_vals``: optional (W,) i32 per-row instance ids for the appended
    points (the fused associate+insert program assigns the frame's own
    points their vote results, matching the two-step map()->associate
    flow where they participate in the association write-back). Default
    appends unassigned (-1).

    TPU scatters execute row-at-a-time (a 204k-row scatter profiled at
    ~25 ms), so this is stream compaction + ONE contiguous window write per
    buffer instead: stable-sort the new rows to the front, roll them to the
    window offset, blend with the existing window contents, and
    dynamic-update-slice the window back (a plain DMA). The window anchors
    at min(count, N - W) so it always fits; rows past logical capacity fall
    outside the window and are dropped, matching the scatter's mode="drop".
    """
    Wn = new_mask.shape[0]
    N = state.capacity
    n_new = jnp.sum(new_mask.astype(jnp.int32))
    if obj_vals is None:
        obj_vals = jnp.full((Wn,), -1, jnp.int32)

    if Wn >= N:  # degenerate tiny-map case (tests): keep the scatter path
        order = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
        dest = jnp.where(new_mask, state.count + order, N)
        new_points = state.points.at[dest].set(
            points.astype(jnp.float32), mode="drop")
        new_colors = state.colors.at[dest].set(
            colors.astype(jnp.uint8), mode="drop")
        ids = state.next_point_id + order
        new_pids = state.point_ids.at[dest].set(
            ids.astype(jnp.int32), mode="drop")
        new_objs = state.obj_ids.at[dest].set(
            obj_vals.astype(jnp.int32), mode="drop")
        new_count = jnp.minimum(state.count + n_new, N)
        return MapState(new_points, new_pids, new_objs, new_colors,
                        new_count.astype(jnp.int32),
                        (state.next_point_id + n_new).astype(jnp.int32))

    start = jnp.minimum(state.count, N - Wn)
    offset = state.count - start                      # 0 unless map near-full
    # stable compaction: new rows first, original row-major order
    perm = jnp.argsort(~new_mask, stable=True)
    i = jnp.arange(Wn)
    is_new = (i >= offset) & (i < offset + n_new)

    # Rolling the INDEX vector instead of each gathered buffer makes
    # roll(vals[perm]) == vals[roll(perm)] -- one cheap 1-D roll. The
    # per-buffer gathers then collapse to ONE (Wn, 4) f32 gather
    # [x, y, z, obj] (TPU gather cost is per ROW, cheapest at exactly 4
    # f32 columns -- geometry.packed_pixel_table microbench) plus the u8
    # color rows; the old separate 1-D obj gather alone traced 1.35
    # ms/keyframe. obj ids are exact in f32 below 2^24 (instance
    # capacities sit orders of magnitude under that).
    perm_r = jnp.roll(perm, offset, axis=0)
    pack = jnp.concatenate(
        [points.astype(jnp.float32),
         obj_vals.astype(jnp.float32)[:, None]], axis=1)
    g = pack[perm_r]
    comp_points = g[:, :3]
    comp_obj = g[:, 3].astype(jnp.int32)
    comp_colors = colors[perm_r].astype(jnp.uint8)

    def window_write(buf, comp):
        old = jax.lax.dynamic_slice_in_dim(buf, start, Wn, axis=0)
        sel = is_new if old.ndim == 1 else is_new[:, None]
        return jax.lax.dynamic_update_slice_in_dim(
            buf, jnp.where(sel, comp.astype(buf.dtype), old), start, axis=0)

    rank_ids = (state.next_point_id + (i - offset)).astype(jnp.int32)
    new_points = window_write(state.points, comp_points)
    new_colors = window_write(state.colors, comp_colors)
    # ids don't need the gather: after compaction row offset+r IS rank r
    old_pids = jax.lax.dynamic_slice_in_dim(state.point_ids, start, Wn, axis=0)
    new_pids = jax.lax.dynamic_update_slice_in_dim(
        state.point_ids, jnp.where(is_new, rank_ids, old_pids), start, axis=0)
    new_objs = window_write(state.obj_ids, comp_obj)

    new_count = jnp.minimum(state.count + n_new, N)
    return MapState(new_points, new_pids, new_objs, new_colors,
                    new_count.astype(jnp.int32),
                    (state.next_point_id + n_new).astype(jnp.int32))


def grow_map_state(state: MapState, new_capacity: int) -> MapState:
    """Re-pad the buffers to a larger capacity bucket (SURVEY hard-part 2:
    recompilation-free growth = a handful of power-of-two buckets per scene;
    each bucket re-specializes the jitted programs once)."""
    if new_capacity <= state.capacity:
        return state
    pad = new_capacity - state.capacity
    return MapState(
        points=jnp.concatenate(
            [state.points, jnp.zeros((pad, 3), jnp.float32)]),
        point_ids=jnp.concatenate(
            [state.point_ids, jnp.full((pad,), -1, jnp.int32)]),
        obj_ids=jnp.concatenate(
            [state.obj_ids, jnp.full((pad,), -1, jnp.int32)]),
        colors=jnp.concatenate(
            [state.colors, jnp.zeros((pad, 3), jnp.uint8)]),
        count=state.count,
        next_point_id=state.next_point_id,
    )


def map_dict(state: MapState) -> dict:
    """Reference-compatible checkpoint dict (vanilla_mapper.py:105-112):
    only the valid prefix is exported, keys/layout identical."""
    import numpy as np

    n = int(state.count)
    return {
        "xyz": np.asarray(state.points[:n]),
        "obj_ids": np.asarray(state.obj_ids[:n]).reshape(-1, 1),
        "ids": np.asarray(state.point_ids[:n]).reshape(-1, 1),
        "max_id": int(state.next_point_id),
        "color": np.asarray(state.colors[:n]),
    }


def from_map_dict(d: dict, capacity: int | None = None) -> MapState:
    import numpy as np

    xyz = np.asarray(d["xyz"], dtype=np.float32)
    n = xyz.shape[0]
    cap = capacity or max(1, n)
    if cap < n:
        raise ValueError(f"capacity {cap} < checkpoint points {n}")
    state = init_map_state(cap)
    obj = np.asarray(d["obj_ids"]).reshape(-1).astype(np.int32)
    pid = np.asarray(d["ids"]).reshape(-1).astype(np.int32)
    col = np.asarray(d["color"]).reshape(n, 3).astype(np.uint8)
    return MapState(
        points=state.points.at[:n].set(xyz),
        point_ids=state.point_ids.at[:n].set(pid),
        obj_ids=state.obj_ids.at[:n].set(obj),
        colors=state.colors.at[:n].set(col),
        count=jnp.asarray(n, jnp.int32),
        next_point_id=jnp.asarray(int(d["max_id"]), jnp.int32),
    )

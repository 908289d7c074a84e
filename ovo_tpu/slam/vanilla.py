"""GT-pose point-cloud mapper backbone (reference: vanilla_mapper.py).

Duck-typed backbone interface shared by all tiers (selected in pipeline):
  track_camera(frame_data), map(frame_data, c2w), get_c2w(fid), get_map(),
  get_kfs(), get_map_dict()/set_map_dict(), get_cam_dict()/set_cam_dict(),
  update_pcd_obj_ids(obj_ids), get_pcd_colors(), map_updated flag.

The map itself is a fixed-capacity device MapState; `map()` is one jitted
program (map_state.map_insert_frame).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from ..mapping.map_state import (MapState, from_map_dict, grow_map_state,
                                 init_map_state, map_dict, map_insert_frame)


class VanillaMapper:
    def __init__(self, config: Dict[str, Any], cam_intrinsics) -> None:
        self.cam_intrinsics = jnp.asarray(np.asarray(cam_intrinsics),
                                          jnp.float32)
        self.config = config
        mapping = config.get("mapping", {})
        self.k_pooling = int(mapping.get("k_pooling", 3))
        self.downscale = int(mapping.get("downscale_res",
                                         mapping.get("downscale_ratio", 2)))
        self.match_distance_th = 0.03  # 3 cm (vanilla_mapper.py:15)
        capacity = int(mapping.get("n_points_capacity", 2 ** 21))
        self.max_capacity = capacity
        # bucketed growth: per-frame device programs scale with the buffer
        # capacity, so start small and double on demand (a few extra
        # compiles per scene instead of paying 2M-point cost from frame 0)
        self.bucketed = bool(mapping.get("bucketed_growth", True))
        start = min(capacity, int(mapping.get("initial_capacity", 2 ** 18)))
        self.state: MapState = init_map_state(
            start if self.bucketed else capacity)
        self._count_ub = 0
        self.estimated_c2ws: Dict[int, np.ndarray] = {}
        self.kfs: Dict[int, Any] = {}
        self.map_updated = False
        # fused associate+insert support (PERF.md 6n wired online): a TIGHT
        # host-side upper bound on the device count feeds the association's
        # active_rows bucket without a per-frame sync -- after each insert
        # the count is fetched ASYNC and harvested one frame later, with
        # un-harvested inserts bounded by the per-frame pixel headroom
        self.supports_fused_insert = True
        self._n_inserts = 0
        self._count_req = None        # (device scalar, n_inserts at request)
        self._count_known = (0, 0)    # (count, n_inserts it covers)

    # -- tracking -------------------------------------------------------
    def track_camera(self, frame_data: List[Any]) -> None:
        frame_id, c2w = frame_data[0], frame_data[3]
        if np.isinf(c2w).sum() > 0 or np.isnan(c2w).sum() > 0:
            return
        self.estimated_c2ws[frame_id] = np.asarray(c2w, np.float32)

    def get_c2w(self, frame_id: int):
        return self.estimated_c2ws.get(frame_id)

    # -- mapping --------------------------------------------------------
    def _headroom(self, depth) -> int:
        return (depth.shape[0] * depth.shape[1]
                // max(self.downscale, 1) ** 2)

    def _pre_insert_grow(self, depth) -> None:
        """Grow BEFORE the insert could overflow. Uses a host-side upper
        bound on count (sum of per-frame maxima) -- reading the real count
        would cost a device round-trip every mapping step."""
        if not self.bucketed:
            return
        self._count_ub += self._headroom(depth)
        cap = self.state.capacity
        while cap < self.max_capacity and self._count_ub > cap:
            cap = min(cap * 2, self.max_capacity)
        if cap != self.state.capacity:
            self.state = grow_map_state(self.state, cap)

    def post_insert(self) -> None:
        """Bookkeeping after an insert landed in self.state (map() or the
        pipeline's fused associate+insert): harvest the PREVIOUS async
        count (its chain is done; the fetch round trip overlaps the
        just-dispatched frame's device work), then request this one.
        count_upper_bound() itself never syncs."""
        if self._count_req is not None:
            arr, n = self._count_req
            self._count_known = (int(np.asarray(arr)), n)
        self._n_inserts += 1
        # COPY the scalar: the next insert donates the state buffers
        c = jnp.copy(self.state.count)
        try:
            c.copy_to_host_async()
        except Exception:
            pass
        self._count_req = (c, self._n_inserts)

    def count_upper_bound(self) -> int:
        """A host-known bound with count_upper_bound() >= device count,
        tight to ~two frames' pixels: the last harvested async count plus
        worst-case headroom for each insert since (no sync here)."""
        c, n = self._count_known
        return c + (self._n_inserts - n) * self._last_headroom

    _last_headroom = 0

    def fused_insert_args(self, frame_data: List[Any]) -> Dict[str, Any]:
        """Pre-insert growth + the insert-side kwargs for the pipeline's
        fused associate+insert call (association.associate_and_insert_
        keyframe). The color buffer is sliced to the insert grid on the
        HOST (a ~0.2 ms numpy copy that overlaps device compute, PERF.md
        6w); active_rows is the power-of-2 bucket covering
        count_upper_bound() (caller contract active_rows >= count holds
        because the bound is >= the device count by construction)."""
        image, depth = frame_data[1], frame_data[2]
        self._last_headroom = self._headroom(depth)
        self._pre_insert_grow(depth)
        ds = self.downscale
        colors = (np.ascontiguousarray(np.asarray(image)[::ds, ::ds])
                  if ds > 1 else np.asarray(image))
        ub = max(self.count_upper_bound(), 1)
        ar = 1 << (ub - 1).bit_length()
        if ar >= self.state.capacity:
            ar = None
        return dict(colors=colors, insert_match_th=self.match_distance_th,
                    k_pooling=self.k_pooling, downscale=ds, active_rows=ar)

    def map(self, frame_data: List[Any], c2w) -> None:
        image, depth = frame_data[1], frame_data[2]
        self._last_headroom = self._headroom(depth)
        self._pre_insert_grow(depth)
        self.state = map_insert_frame(
            self.state, jnp.asarray(image), jnp.asarray(depth, jnp.float32),
            jnp.asarray(c2w, jnp.float32), self.cam_intrinsics,
            k_pooling=self.k_pooling, downscale=self.downscale,
            match_th=self.match_distance_th)
        self.post_insert()

    # -- accessors ------------------------------------------------------
    def get_map(self) -> MapState:
        return self.state

    def set_map(self, state: MapState) -> None:
        self.state = state

    def get_kfs(self):
        return self.kfs

    def update_pcd_obj_ids(self, state_or_ids) -> None:
        if isinstance(state_or_ids, MapState):
            self.state = state_or_ids
        else:
            self.state = self.state._replace(
                obj_ids=jnp.asarray(state_or_ids, jnp.int32))

    def get_pcd_colors(self) -> np.ndarray:
        n = int(self.state.count)
        return np.asarray(self.state.colors[:n])

    # -- checkpointing (reference key layout) ---------------------------
    def get_map_dict(self) -> Dict[str, Any]:
        return map_dict(self.state)

    def set_map_dict(self, d: Dict[str, Any]) -> None:
        import numpy as _np

        n = int(_np.asarray(d["xyz"]).shape[0])
        cap = self.state.capacity
        while cap < n:
            cap = min(cap * 2, max(self.max_capacity, n))
        self.state = from_map_dict(d, capacity=cap)
        self._count_ub = n
        self._n_inserts = 0
        self._count_req = None
        self._count_known = (n, 0)

    def get_cam_dict(self) -> Dict[int, np.ndarray]:
        return {k: np.asarray(v) for k, v in self.estimated_c2ws.items()}

    def set_cam_dict(self, cam_dict: Dict[Any, Any]) -> None:
        self.estimated_c2ws = {int(k): np.asarray(v, np.float32)
                               for k, v in cam_dict.items()}

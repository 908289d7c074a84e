"""SLAM backbone tier backed by the native C++ RGB-D tracking front-end.

Reference behavior: WrapperORBSLAM (/root/reference/ovo/slam/orbslam.py):
extends the vanilla mapper but takes poses from a native tracker
(blocking ``process_image_rgbd``), maps only on tracker keyframes (recording
each keyframe's point-id range), and rebuilds the dense map by rigidly
re-transforming keyframe point blocks when the tracker reports a "big
change" (loop closure / global BA).

The native library (ovo_tpu/native/tracker) exposes the same binding
surface through a C ABI; it is built on demand with the in-image g++.
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..mapping.map_state import MapState
from ..ops import segment_mxu
from .vanilla import VanillaMapper

_TRACKER_DIR = os.path.join(os.path.dirname(__file__), "..", "native",
                            "tracker")
_LIB_PATH = os.path.join(_TRACKER_DIR, "libovo_tracker.so")

# ORB-SLAM3 tracking-state codes used by the reference (orbslam.py:43-49)
STATE_OK = 2
STATE_LOST = 3


def _load_library() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _TRACKER_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ovo_tracker_create.restype = ctypes.c_void_p
    lib.ovo_tracker_create.argtypes = [ctypes.c_double] * 3
    lib.ovo_tracker_process_image_rgbd.restype = ctypes.c_int
    lib.ovo_tracker_process_image_rgbd.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double]
    lib.ovo_tracker_get_last_trajectory_point.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    for name in ("ovo_tracker_get_tracking_state",
                 "ovo_tracker_is_last_frame_kf",
                 "ovo_tracker_get_last_big_change_idx"):
        getattr(lib, name).restype = ctypes.c_int
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.ovo_tracker_last_inlier_ratio.restype = ctypes.c_double
    lib.ovo_tracker_last_inlier_ratio.argtypes = [ctypes.c_void_p]
    lib.ovo_tracker_num_keyframes.restype = ctypes.c_int
    lib.ovo_tracker_num_keyframes.argtypes = [ctypes.c_void_p]
    lib.ovo_tracker_get_keyframe_pose.restype = ctypes.c_double
    lib.ovo_tracker_get_keyframe_pose.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
    lib.ovo_tracker_keyframe_culled.restype = ctypes.c_int
    lib.ovo_tracker_keyframe_culled.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ovo_tracker_set_loop_params.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double]
    lib.ovo_tracker_destroy.argtypes = [ctypes.c_void_p]
    return lib


class NativeTracker:
    """Thin ctypes facade with the reference's orbslam3 surface."""

    def __init__(self, kf_trans_th: float = 0.15, kf_rot_th: float = 0.15,
                 kf_inlier_th: float = 0.6):
        self._lib = _load_library()
        self._h = self._lib.ovo_tracker_create(kf_trans_th, kf_rot_th,
                                               kf_inlier_th)

    def process_image_rgbd(self, gray: np.ndarray, depth: np.ndarray,
                           fx, fy, cx, cy, timestamp: float = 0.0) -> int:
        gray = np.ascontiguousarray(gray, np.float32)
        depth = np.ascontiguousarray(depth, np.float32)
        h, w = gray.shape
        return self._lib.ovo_tracker_process_image_rgbd(
            self._h, gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            w, h, fx, fy, cx, cy, timestamp)

    def get_last_trajectory_point(self) -> np.ndarray:
        out = (ctypes.c_double * 16)()
        self._lib.ovo_tracker_get_last_trajectory_point(self._h, out)
        return np.asarray(out, dtype=np.float64).reshape(4, 4)

    def get_tracking_state(self) -> int:
        return self._lib.ovo_tracker_get_tracking_state(self._h)

    def is_last_frame_kf(self) -> bool:
        return bool(self._lib.ovo_tracker_is_last_frame_kf(self._h))

    def get_last_big_change_idx(self) -> int:
        return self._lib.ovo_tracker_get_last_big_change_idx(self._h)

    def last_inlier_ratio(self) -> float:
        return self._lib.ovo_tracker_last_inlier_ratio(self._h)

    def num_keyframes(self) -> int:
        return self._lib.ovo_tracker_num_keyframes(self._h)

    def get_keyframes(self):
        """All stored keyframes as (frame_id, c2w pose, culled) triples,
        with poses reflecting any loop-closure corrections."""
        out = []
        buf = (ctypes.c_double * 16)()
        for i in range(self.num_keyframes()):
            fid = self._lib.ovo_tracker_get_keyframe_pose(self._h, i, buf)
            pose = np.array(buf, dtype=np.float64).reshape(4, 4)  # copy
            culled = bool(self._lib.ovo_tracker_keyframe_culled(self._h, i))
            out.append((fid, pose, culled))
        return out

    def get_keyframe_points(self) -> np.ndarray:
        """(n_live_kf, 13) rows [frame_id, c2w[:3, :4].flatten()] -- the
        reference orbslam3 binding's aggregate keyframe export
        (orbslam.py:71 ``updated_kfs``); culled keyframes are omitted,
        exactly the rows its ``update_map`` iterates."""
        rows = [np.concatenate([[float(fid)], pose[:3, :4].reshape(-1)])
                for fid, pose, culled in self.get_keyframes() if not culled]
        return (np.stack(rows).astype(np.float64) if rows
                else np.zeros((0, 13)))

    def set_loop_params(self, min_kf_gap: int = 0, radius: float = 0.0,
                        rot_limit: float = 0.0, inlier_th: float = 0.0):
        """Tune loop-closure gates; non-positive keeps the default."""
        self._lib.ovo_tracker_set_loop_params(self._h, min_kf_gap, radius,
                                              rot_limit, inlier_th)

    def shutdown(self) -> None:
        if self._h:
            self._lib.ovo_tracker_destroy(self._h)
            self._h = None


class WrapperORBSLAM(VanillaMapper):
    """Vanilla mapper geometry + native-tracker poses (orbslam.py:17-120)."""

    # keyframe-gated mapping + LC rebuilds don't fit the pipeline's fused
    # associate+insert fast path (which assumes every-map-cadence inserts)
    supports_fused_insert = False

    def __init__(self, config: Dict[str, Any], cam_intrinsics,
                 world_ref: np.ndarray | None = None):
        super().__init__(config, cam_intrinsics)
        slam_cfg = config.get("slam", {})
        self.tracker = NativeTracker(
            kf_trans_th=slam_cfg.get("kf_trans_th", 0.15),
            kf_rot_th=slam_cfg.get("kf_rot_th", 0.15),
            kf_inlier_th=slam_cfg.get("kf_inlier_th", 0.6))
        # loop-closing gates, config-tunable like the reference's per-scene
        # ORB yamls (non-positive values keep the native defaults);
        # close_loops: false turns loop detection off entirely (the
        # candidate gap becomes unreachable), leaving pure odometry
        if slam_cfg.get("close_loops", True):
            self.tracker.set_loop_params(
                min_kf_gap=int(slam_cfg.get("loop_min_kf_gap", 0)),
                radius=float(slam_cfg.get("loop_radius", 0.0)),
                rot_limit=float(slam_cfg.get("loop_rot_limit", 0.0)),
                inlier_th=float(slam_cfg.get("loop_inlier_th", 0.0)))
        else:
            self.tracker.set_loop_params(min_kf_gap=1 << 30)
        # express tracker-relative poses in the dataset's world frame, like
        # the reference anchors at the first GT pose (orbslam.py:25)
        self.world_ref = (np.asarray(world_ref, np.float32)
                          if world_ref is not None
                          else np.eye(4, dtype=np.float32))
        self.kf_blocks: Dict[int, Dict[str, Any]] = {}
        self.last_big_change = 0
        self._last_was_kf = False

    def track_camera(self, frame_data: List[Any]) -> None:
        frame_id, image, depth = frame_data[0], frame_data[1], frame_data[2]
        gray = np.asarray(image, np.float32).mean(axis=-1) / 255.0
        K = np.asarray(self.cam_intrinsics)
        state = self.tracker.process_image_rgbd(
            gray, depth, float(K[0, 0]), float(K[1, 1]), float(K[0, 2]),
            float(K[1, 2]), float(frame_id))
        if state != STATE_OK:
            print(f"Tracking state {state} at frame {frame_id}")
            return
        rel = self.tracker.get_last_trajectory_point().astype(np.float32)
        self.estimated_c2ws[frame_id] = self.world_ref @ rel
        self._last_was_kf = self.tracker.is_last_frame_kf()

    def map(self, frame_data: List[Any], c2w) -> None:
        """Map only on tracker keyframes, recording the point-id block for
        loop-closure re-transforms (orbslam.py:52-59)."""
        if not self._last_was_kf:
            self._poll_big_change()
            return
        start = int(self.state.count)
        super().map(frame_data, c2w)
        end = int(self.state.count)
        frame_id = frame_data[0]
        self.kf_blocks[frame_id] = {
            "range": (start, end),
            "c2w": np.asarray(c2w, np.float32),
        }
        self.kfs[frame_id] = True
        self._poll_big_change()

    def _poll_big_change(self) -> None:
        idx = self.tracker.get_last_big_change_idx()
        if idx != self.last_big_change:
            self.last_big_change = idx
            # refresh keyframe poses from the tracker's (loop-corrected)
            # keyframe store; collect the culled ones for dropping
            culled_ids = set()
            for fid, pose, culled in self.tracker.get_keyframes():
                frame_id = int(round(fid))
                if culled:
                    culled_ids.add(frame_id)
                else:
                    self.estimated_c2ws[frame_id] = (
                        self.world_ref @ pose.astype(np.float32))
            self._rebuild_map(culled_ids)
            for fid in culled_ids:
                self.kfs.pop(fid, None)
            self.map_updated = True

    def _rebuild_map(self, culled_ids=frozenset()) -> None:
        """Rigidly re-transform each keyframe's point block with its updated
        pose and drop blocks of culled keyframes (reference
        orbslam.py:68-115). The heavy lifting is ONE jitted device program:
        per-point block ids via searchsorted, per-block 3x4 deltas applied
        through an MXU table lookup, and (only when keyframes were culled) a
        stable compaction of the surviving points."""
        blocks = list(self.kf_blocks.items())
        if not blocks:
            return
        n_b = len(blocks)
        # pad the block axis to a power-of-2 bucket (+1 identity row) so the
        # rare rebuild only ever compiles a handful of specializations
        bp = 1
        while bp < n_b + 1:
            bp *= 2
        starts = np.empty((bp,), np.int32)
        deltas = np.tile(np.eye(3, 4, dtype=np.float32), (bp, 1, 1))
        keep = np.ones((bp,), np.float32)
        for b, (frame_id, blk) in enumerate(blocks):
            starts[b] = blk["range"][0]
            if frame_id in culled_ids:
                keep[b] = 0.0
                continue
            new_c2w = self.estimated_c2ws.get(frame_id)
            if new_c2w is None:
                continue
            delta = new_c2w @ np.linalg.inv(blk["c2w"])
            deltas[b] = delta[:3, :4]
            blk["c2w"] = np.asarray(new_c2w, np.float32)
        starts[n_b:] = blocks[-1][1]["range"][1]  # end of the last block
        compact = bool(culled_ids)
        self.state = _apply_block_deltas(
            self.state, jnp.asarray(starts), jnp.asarray(deltas),
            jnp.asarray(keep), compact=compact)
        if compact:
            # whole blocks were dropped: shift the surviving ranges
            dropped = 0
            new_blocks: Dict[int, Dict[str, Any]] = {}
            for frame_id, blk in blocks:
                s, e = blk["range"]
                if frame_id in culled_ids:
                    dropped += e - s
                    continue
                blk["range"] = (s - dropped, e - dropped)
                new_blocks[frame_id] = blk
            self.kf_blocks = new_blocks


@functools.partial(jax.jit, static_argnames=("compact",), donate_argnums=(0,))
def _apply_block_deltas(state: MapState, starts, deltas, keep, *,
                        compact: bool) -> MapState:
    """Apply per-keyframe-block rigid corrections to the point map.

    DONATION CONTRACT: ``state`` is donated (see map_state.map_insert_frame).

    starts: (Bp,) i32 -- block b covers rows [starts[b], starts[b+1]); the
            tail is padded with the end of the last block so rows past it
            resolve to the identity row Bp-1.
    deltas: (Bp, 3, 4) f32 rigid transforms (row Bp-1 and padding identity).
    keep:   (Bp,) f32 0/1 -- 0 drops the whole block (culled keyframe).
    """
    n = state.capacity
    bp = deltas.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    blk = jnp.searchsorted(starts, idx, side="right").astype(jnp.int32) - 1
    blk = jnp.where((blk < 0) | (blk >= bp), bp - 1, blk)
    m = segment_mxu.table_lookup(blk, deltas.reshape(bp, 12)).reshape(n, 3, 4)
    pts = jnp.einsum("nij,nj->ni", m[:, :, :3], state.points) + m[:, :, 3]
    if not compact:
        return state._replace(points=pts)
    keep_pt = (segment_mxu.table_lookup(blk, keep) > 0.5) & (idx < state.count)
    perm = jnp.argsort(~keep_pt, stable=True)
    return MapState(
        points=pts[perm],
        point_ids=state.point_ids[perm],
        obj_ids=state.obj_ids[perm],
        colors=state.colors[perm],
        count=jnp.sum(keep_pt.astype(jnp.int32)),
        next_point_id=state.next_point_id,
    )

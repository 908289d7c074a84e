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
import os
import subprocess
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from ..mapping.map_state import MapState
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

    def shutdown(self) -> None:
        if self._h:
            self._lib.ovo_tracker_destroy(self._h)
            self._h = None


class WrapperORBSLAM(VanillaMapper):
    """Vanilla mapper geometry + native-tracker poses (orbslam.py:17-120)."""

    def __init__(self, config: Dict[str, Any], cam_intrinsics,
                 world_ref: np.ndarray | None = None):
        super().__init__(config, cam_intrinsics)
        slam_cfg = config.get("slam", {})
        self.tracker = NativeTracker(
            kf_trans_th=slam_cfg.get("kf_trans_th", 0.15),
            kf_rot_th=slam_cfg.get("kf_rot_th", 0.15),
            kf_inlier_th=slam_cfg.get("kf_inlier_th", 0.6))
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
            self._rebuild_map()
            self.map_updated = True

    def _rebuild_map(self) -> None:
        """Rigidly re-transform each keyframe's point block with its updated
        pose (orbslam.py:68-115). Block-diagonal batched transform on
        device; blocks whose keyframes were culled would be dropped here."""
        state = self.state
        pts = np.array(state.points)
        for frame_id, blk in self.kf_blocks.items():
            new_c2w = self.estimated_c2ws.get(frame_id)
            if new_c2w is None:
                continue
            s, e = blk["range"]
            old = blk["c2w"]
            delta = new_c2w @ np.linalg.inv(old)
            pts[s:e] = pts[s:e] @ delta[:3, :3].T + delta[:3, 3]
            blk["c2w"] = np.asarray(new_c2w, np.float32)
        self.state = state._replace(points=jnp.asarray(pts))

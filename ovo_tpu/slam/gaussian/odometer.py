"""Frame-to-frame RGB-D visual odometry for tracker initialization.

Reference behavior: gaussian_slam/entities/visual_odometer.py:7-77 (Open3D
tensor RGB-D odometry estimating the relative transform between consecutive
frames, used to initialize the render-based pose optimization,
tracker.py:119-131).

Implementation: the repo's native C++ dense direct odometry
(ovo_tpu/native/tracker: coarse-to-fine Gauss-Newton over Huber photometric
+ geometric residuals) already solves exactly this; this facade feeds it
consecutive frames and reports the relative pose between the last two.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class VisualOdometer:
    def __init__(self, fx: float, fy: float, cx: float, cy: float,
                 depth_scale: float = 1.0):
        from ..orbslam import NativeTracker

        self._tracker = NativeTracker()
        self._K = (fx, fy, cx, cy)
        self._depth_scale = depth_scale
        self._prev_c2w: Optional[np.ndarray] = None
        self._last_rel: Optional[np.ndarray] = None

    def estimate_rel_pose(self, image: np.ndarray, depth: np.ndarray
                          ) -> Optional[np.ndarray]:
        """Feed the next frame; returns the c2w-relative transform from the
        previous frame to this one (None for the first frame or on
        tracking failure)."""
        img = np.asarray(image)
        if img.ndim == 3:
            gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                    + 0.114 * img[..., 2])
        else:
            gray = img
        if gray.dtype == np.uint8:
            gray = gray.astype(np.float32) / 255.0
        gray = np.ascontiguousarray(gray, np.float32)
        dep = np.ascontiguousarray(
            np.asarray(depth, np.float32) / self._depth_scale)
        fx, fy, cx, cy = self._K
        state = self._tracker.process_image_rgbd(gray, dep, fx, fy, cx, cy)
        if state < 0:
            self._prev_c2w = None
            return None
        c2w = self._tracker.get_last_trajectory_point().reshape(4, 4)
        rel = None
        if self._prev_c2w is not None:
            # camera-frame delta (right-composition), invariant to the
            # tracker's world anchoring: c2w_i = c2w_{i-1} @ rel
            rel = np.linalg.inv(self._prev_c2w) @ c2w
        self._prev_c2w = c2w
        self._last_rel = rel
        return rel

    def shutdown(self) -> None:
        self._tracker.shutdown()

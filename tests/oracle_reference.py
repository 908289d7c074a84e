"""Sequential numpy/torch oracle reproducing the reference's association
semantics (ovo.py:240-324) for parity-testing the vectorized device program.

This is an independent re-expression of the documented behavior (Python loop
over masks, torch.mode majority vote, sequential minting, OR-fusion, top-k
heaps), kept deliberately naive and readable.
"""
from __future__ import annotations

import heapq
from typing import Dict, List, Tuple

import numpy as np
import torch


class OracleInstance:
    def __init__(self, iid, n_top):
        self.id = iid
        self.n_top = n_top
        self.top = []  # heap of (area, kf)
        self.n_points = 0

    def add_top_kf(self, kf, area):
        for i, (a, k) in enumerate(self.top):
            if k == kf:
                if area > a:
                    self.top[i] = (area, kf)
                    heapq.heapify(self.top)
                return
        if len(self.top) < self.n_top:
            heapq.heappush(self.top, (area, kf))
        else:
            heapq.heappushpop(self.top, (area, kf))

    def is_top(self, kf):
        return any(k == kf for _, k in self.top)


class OracleTracker:
    """Holds objects + next id across keyframes (mirrors OVO's host state)."""

    def __init__(self, track_th=100, n_top=10000):
        self.objects: Dict[int, OracleInstance] = {}
        self.next_id = 0
        self.track_th = track_th
        self.n_top = n_top

    def track(self, obj_ids: np.ndarray, matched_idx: np.ndarray,
              matched_seg: np.ndarray, seg_map: np.ndarray, kf_id: int):
        """_track_objects: returns (updated obj_ids, {ins: [(mask_idx, area)]})."""
        obj_ids = obj_ids.copy()
        matched_info: Dict[int, List[Tuple[int, int]]] = {}
        for m in range(seg_map.max() + 1):
            ins = -1
            pts = matched_idx[matched_seg == m]
            if len(pts) > self.track_th:
                area = int((seg_map == m).sum())
                assigned = obj_ids[pts] > -1
                if assigned.sum() > self.track_th:
                    ins = int(torch.mode(
                        torch.from_numpy(obj_ids[pts[assigned]])).values)
                    self.objects[ins].add_top_kf(kf_id, area)
                    self.objects[ins].n_points += int((~assigned).sum())
                    matched_info.setdefault(ins, []).append((m, area))
                elif (~assigned).sum() > self.track_th:
                    ins = self.next_id
                    self.next_id += 1
                    o = OracleInstance(ins, self.n_top)
                    o.add_top_kf(kf_id, area)
                    o.n_points = int((~assigned).sum())
                    self.objects[ins] = o
                    matched_info[ins] = [(m, area)]
                if ins > -1:
                    obj_ids[pts[~assigned]] = ins
        return obj_ids, matched_info

    def fuse(self, binary_maps: np.ndarray, matched_info, kf_id: int):
        """_fuse_masks_with_same_ins_id: returns (ins_ids, fused_maps, areas)."""
        bm = binary_maps.copy()
        ins_ids, slots, areas = [], [], []
        for ins, data in matched_info.items():
            first = data[0][0]
            if len(data) > 1:
                for m, _ in data[1:]:
                    bm[first] |= bm[m]
                area = int(bm[first].sum())
                self.objects[ins].add_top_kf(kf_id, area)
            else:
                area = data[0][1]
            if self.n_top <= 0 or self.objects[ins].is_top(kf_id):
                ins_ids.append(ins)
                slots.append(first)
                areas.append(area)
        return ins_ids, bm[slots] if slots else bm[:0], areas


def oracle_frustum_mask(depth, c2w, K, points):
    """Frustum cull oracle replicating the reference's plane construction
    (geometry_utils.py:163-277), including plane i anchored at corners[i]."""
    h, w = depth.shape
    d = depth[depth > 0]
    zmin, zmax = float(d.min()), float(d.max())
    corners_px = np.array(
        [[0, 0, zmin], [w, 0, zmin], [0, h, zmin], [w, h, zmin],
         [0, 0, zmax], [w, 0, zmax], [0, h, zmax], [w, h, zmax]], float)
    x = (corners_px[:, 0] - K[0, 2]) * corners_px[:, 2] / K[0, 0]
    y = (corners_px[:, 1] - K[1, 2]) * corners_px[:, 2] / K[1, 1]
    cam = np.stack([x, y, corners_px[:, 2]], 1)
    c = cam @ c2w[:3, :3].T + c2w[:3, 3]
    normals = np.stack([
        np.cross(c[2] - c[0], c[1] - c[0]),
        np.cross(c[6] - c[4], c[5] - c[4]),
        np.cross(c[4] - c[0], c[2] - c[0]),
        np.cross(c[7] - c[3], c[1] - c[3]),
        np.cross(c[5] - c[1], c[3] - c[1]),
        np.cross(c[6] - c[2], c[0] - c[2]),
    ])
    D = -np.sum(normals * c[:6], axis=1)
    lo, hi = c.min(0), c.max(0)
    in_aabb = ((points >= lo) & (points <= hi)).all(1)
    signed = points @ normals.T + D
    return in_aabb & (signed <= 0).all(1)


def oracle_match_points(depth, w2c, points, K, th, frustum=None):
    """match_3d_points_to_2d_pixels oracle (geometry_utils.py:46-89)."""
    cam = points @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.round(K[0, 0] * cam[:, 0] / z + K[0, 2]).astype(np.int64)
        v = np.round(K[1, 1] * cam[:, 1] / z + K[1, 2]).astype(np.int64)
    h, w = depth.shape
    in_plane = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z > 0)
    uc, vc = np.clip(u, 0, w - 1), np.clip(v, 0, h - 1)
    d = depth[vc, uc]
    ok = in_plane & (np.abs(z - d) < th) & (d != 0)
    if frustum is not None:
        ok = ok & frustum
    return ok, uc, vc

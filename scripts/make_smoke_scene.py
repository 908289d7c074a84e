#!/usr/bin/env python
"""Fabricate a tiny STATIC-WORLD Replica-format scene for end-to-end CLI
smoke runs (run_eval.py --run --segment --eval with the tiny-model per-scene
configs `configs/Replica/tinyroom*.yaml`).

The scene is a frontal wall at z=2 m with a floor wedge below: texture and
depth are functions of WORLD coordinates (a camera translating right sees
consistent parallax), which matters — a texture rolled in pixel space breaks
the RGB-D odometry used by the tracking smoke configs.

Layout produced under --out (default data/input/Datasets/Replica/<scene>):
  results/frame%04d.jpg        RGB
  results/depth%04d.png        uint16 depth at depth_scale (6553.5 = m/1e4*...)
  traj.txt                     c2w row-major 16 floats per line
  ../semantic_gt/<scene>.txt   per-vertex raw GT ids (93=wall, 40=floor)
  ../<scene>_mesh.ply          GT point cloud (ascii ply)
(paths follow io._load_replica_scene: <root>/Datasets/Replica/semantic_gt/
 and <root>/Datasets/Replica/<scene>_mesh.ply)

Usage:
  python scripts/make_smoke_scene.py --scene tinyroom2 [--frames 12]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

H, W = 64, 96
FX = FY = 80.0
CX, CY = 47.5, 31.5
DEPTH_SCALE = 6553.5
WALL_Z = 2.0
FLOOR_Y = 0.45          # camera-frame y (down) where the floor starts
WALL_ID, FLOOR_ID = 93, 40   # Replica raw ids: wall, floor


def world_texture(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """RGB as a function of world coordinates (static world)."""
    r = 0.5 + 0.45 * np.sin(9.0 * x) * np.cos(7.0 * y)
    g = 0.5 + 0.45 * np.sin(5.0 * x + 11.0 * z)
    b = 0.5 + 0.45 * np.cos(13.0 * y + 3.0 * x)
    return np.clip(np.stack([r, g, b], -1) * 255, 0, 255).astype(np.uint8)


def render(c2w: np.ndarray):
    """Ray-cast the wall+floor from pose c2w -> (rgb, depth_m)."""
    u = (np.arange(W) - CX) / FX
    v = (np.arange(H) - CY) / FY
    uu, vv = np.meshgrid(u, v)
    # rays in camera frame (z forward, y down)
    dirs = np.stack([uu, vv, np.ones_like(uu)], -1)
    R, t = c2w[:3, :3], c2w[:3, 3]
    dirs_w = dirs @ R.T
    # wall plane z_w = WALL_Z
    tz = (WALL_Z - t[2]) / np.where(np.abs(dirs_w[..., 2]) < 1e-9, 1e-9,
                                    dirs_w[..., 2])
    # floor plane y_w = FLOOR_Y
    ty = (FLOOR_Y - t[1]) / np.where(np.abs(dirs_w[..., 1]) < 1e-9, 1e-9,
                                     dirs_w[..., 1])
    ty = np.where(ty > 0, ty, np.inf)
    tz = np.where(tz > 0, tz, np.inf)
    t_hit = np.minimum(ty, tz)
    t_hit = np.where(np.isfinite(t_hit), t_hit, 0.0)
    pts = t_hit[..., None] * dirs_w + t
    depth = t_hit * dirs[..., 2]  # z-depth in camera frame
    rgb = world_texture(pts[..., 0], pts[..., 1], pts[..., 2])
    label = np.where(ty < tz, FLOOR_ID, WALL_ID)
    return rgb, depth.astype(np.float32), pts, label


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="tinyroom2")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--root", default="data/input")
    args = ap.parse_args()

    import cv2

    scene_dir = Path(args.root) / "Datasets" / "Replica" / args.scene
    (scene_dir / "results").mkdir(parents=True, exist_ok=True)
    replica_root = Path(args.root) / "Datasets" / "Replica"
    gt_dir = replica_root / "semantic_gt"
    gt_dir.mkdir(parents=True, exist_ok=True)

    poses = []
    gt_pts, gt_labels = None, None
    for i in range(args.frames):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.02 * i       # translate right
        c2w[2, 3] = -0.01 * i      # back away slightly
        rgb, depth, pts, label = render(c2w)
        cv2.imwrite(str(scene_dir / "results" / f"frame{i:04d}.jpg"),
                    rgb[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 98])
        d16 = np.clip(depth * DEPTH_SCALE, 0, 65535).astype(np.uint16)
        cv2.imwrite(str(scene_dir / "results" / f"depth{i:04d}.png"), d16)
        poses.append(c2w.reshape(-1))
        if i == 0:
            keep = depth.reshape(-1) > 0
            gt_pts = pts.reshape(-1, 3)[keep][::3]
            gt_labels = label.reshape(-1)[keep][::3]
    np.savetxt(scene_dir / "traj.txt", np.stack(poses), fmt="%.8f")

    np.savetxt(gt_dir / f"{args.scene}.txt", gt_labels, fmt="%d")
    with open(replica_root / f"{args.scene}_mesh.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(gt_pts)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n")
        for p in gt_pts:
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f}\n")
    print(f"scene {args.scene}: {args.frames} frames -> {scene_dir}, "
          f"GT {len(gt_pts)} verts -> {gt_dir}")


if __name__ == "__main__":
    main()

"""Synthetic "painted wall" scene for deterministic E2E pipeline tests.

A fronto-parallel wall at z = WALL_Z carries axis-aligned rectangular
"objects", each with a class label. The camera translates laterally, so
frames see shifting crops of the wall. Geometry is exact (depth = constant),
masks are the projected rectangles, and the image encodes each pixel's class
label in its red channel -- which lets the RecordedEmbedder look up a
deterministic per-class unit embedding without any model weights.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

WALL_Z = 3.0
H, W = 64, 96
FX = FY = 80.0
CLASSES = ["wall", "chair", "table", "lamp"]


def make_camera():
    K = np.array([[FX, 0, W / 2 - 0.5], [0, FY, H / 2 - 0.5], [0, 0, 1]],
                 dtype=np.float32)
    return K


def wall_regions() -> List[Tuple[str, Tuple[float, float, float, float]]]:
    """(class, (x0, y0, x1, y1)) rectangles in world coords on the wall.
    Background is 'wall'."""
    return [
        ("chair", (-1.2, -0.4, -0.4, 0.6)),
        ("table", (0.0, -0.2, 1.0, 0.7)),
        ("lamp", (1.3, -0.9, 1.9, -0.1)),
    ]


def label_at(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    lab = np.zeros(x.shape, np.int32)  # wall
    for i, (cls, (x0, y0, x1, y1)) in enumerate(wall_regions()):
        inside = (x >= x0) & (x < x1) & (y >= y0) & (y < y1)
        lab[inside] = CLASSES.index(cls)
    return lab


class SyntheticWallDataset:
    """Duck-typed dataset: __getitem__ -> (id, image, depth, pose)."""

    def __init__(self, n_frames: int = 12, step: float = 0.25,
                 textured: bool = False, trajectory: str = "line",
                 noise_sigma: float = 0.0):
        self.K = make_camera()
        self.intrinsics = self.K
        self.height, self.width = H, W
        self.crop_edge = 0
        self.dataset_config = {"H": H, "W": W}
        # textured: paint a WORLD-anchored sinusoid into the blue channel so
        # dense photometric trackers (slam_module orbslam) have gradients;
        # red keeps the class label, so masks/embeddings are unaffected.
        # noise_sigma: per-frame gaussian noise (uint8 units) on the blue
        # channel, deterministically seeded by frame id -- the drift source
        # for loop-closure tests.
        self.textured = textured
        self.noise_sigma = noise_sigma
        self.poses = []
        if trajectory == "loop":
            # out-and-back along +x: the return revisits early keyframes
            xs = [min(i, n_frames - i) * step for i in range(n_frames)]
        else:
            xs = [(i - n_frames / 2) * step for i in range(n_frames)]
        for x in xs:
            c2w = np.eye(4, dtype=np.float32)
            c2w[0, 3] = x
            self.poses.append(c2w)

    def __len__(self):
        return len(self.poses)

    def frame_world_coords(self, index):
        c2w = self.poses[index]
        v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        z = WALL_Z - c2w[2, 3]
        x = (u - self.K[0, 2]) * z / self.K[0, 0] + c2w[0, 3]
        y = (v - self.K[1, 2]) * z / self.K[1, 1] + c2w[1, 3]
        return x, y, z

    def __getitem__(self, index):
        x, y, z = self.frame_world_coords(index)
        depth = np.full((H, W), z, np.float32)
        lab = label_at(x, y)
        image = np.zeros((H, W, 3), np.uint8)
        image[..., 0] = lab  # label encoded in red channel
        image[..., 1] = 128
        if self.textured:
            nz = (np.random.default_rng(1000 + index).normal(
                0, self.noise_sigma, (H, W)) if self.noise_sigma > 0 else 0)
            tex_b = 128 + 90 * np.sin(3.0 * x) * np.cos(3.5 * y)
            tex_g = 128 + 90 * np.cos(2.2 * x + 0.7) * np.sin(2.7 * y + 0.3)
            image[..., 1] = np.clip(tex_g + nz, 0, 255).astype(np.uint8)
            image[..., 2] = np.clip(tex_b + nz, 0, 255).astype(np.uint8)
        return index, image, depth, self.poses[index]


def gt_mesh(n: int = 120):
    """Dense GT 'mesh' vertices over the wall with labels."""
    xs = np.linspace(-2.2, 2.2, n)
    ys = np.linspace(-1.1, 1.1, n // 2)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    vtx = np.stack([gx.ravel(), gy.ravel(),
                    np.full(gx.size, WALL_Z)], axis=1).astype(np.float32)
    labels = label_at(gx.ravel(), gy.ravel())
    return vtx, labels


def synthetic_mask_fn(image: np.ndarray, frame_id: int):
    """Perfect instance masks from the label image: one mask per connected
    label patch visible in the frame (here: per class-region)."""
    lab = image[..., 0].astype(np.int32)
    masks, ids = [], []
    for val in np.unique(lab):
        m = lab == val
        if m.sum() < 20:
            continue
        masks.append(m)
        ids.append(val)
    if not masks:
        return None
    binary = np.stack(masks)
    seg = -np.ones(lab.shape, np.int32)
    for i, m in enumerate(binary):
        seg[m] = i
    return seg, binary


def mask_label_fn(image, fused_maps, valid):
    """Mode of the red channel inside each mask -> class label."""
    lab = image[..., 0].astype(np.int32)
    out = np.zeros(fused_maps.shape[0], np.int64)
    for i in range(fused_maps.shape[0]):
        if not valid[i] or not fused_maps[i].any():
            continue
        vals, counts = np.unique(lab[fused_maps[i]], return_counts=True)
        out[i] = vals[np.argmax(counts)]
    return out


def class_embeddings(dim: int = 16) -> Dict[str, np.ndarray]:
    embeds = np.zeros((len(CLASSES), dim), np.float32)
    for i in range(len(CLASSES)):
        embeds[i, i] = 1.0
    return embeds


def noisy_mask_fn(image: np.ndarray, frame_id: int):
    """Deterministically CORRUPTED segmentation: every mask shifts a few
    pixels and a horizontal band is painted with the wrong mask id. Both
    the device pipeline and the numpy oracle consume the identical
    imperfect masks, so their end-to-end mIoU must agree on a non-trivial
    (clearly < 1) value."""
    got = synthetic_mask_fn(image, frame_id)
    if got is None:
        return None
    seg, binary = got
    rng = np.random.default_rng(1000 + frame_id)
    H, _ = seg.shape
    shifted = []
    for m in binary:
        dy, dx = rng.integers(-3, 4, 2)
        shifted.append(np.roll(np.roll(m, int(dy), 0), int(dx), 1))
    binary = np.stack(shifted)
    b = int(rng.integers(0, H - 6))
    j = int(rng.integers(0, len(binary)))
    binary[:, b:b + 6, :] = False
    binary[j, b:b + 6, :] = True
    seg = -np.ones_like(seg)
    for i, m in enumerate(binary):
        seg[m] = i
    return seg, binary

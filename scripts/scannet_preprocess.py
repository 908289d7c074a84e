#!/usr/bin/env python
"""Extract per-vertex GT semantic labels from ScanNet label meshes.

Reference behavior: /root/reference/scripts/scannet_preprocess.py -- reads
``<scene>_vh_clean_2.labels.ply`` (and the ScanNet200 variants), writes the
label column as ``semantic_gt/<scene>.txt`` consumable by ``--eval``.
Uses the in-repo PLY reader (no plyfile/open3d in this image).
"""
from __future__ import annotations

import argparse
import os
import struct
from pathlib import Path

import numpy as np


def read_ply_labels(path: Path) -> np.ndarray:
    """Read the per-vertex ``label`` property from a ScanNet labels PLY."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vtx = None
        props = []
        current = None
        for line in header:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "element":
                current = parts[1]
                if current == "vertex":
                    n_vtx = int(parts[2])
            elif parts[0] == "property" and current == "vertex":
                props.append((parts[1], parts[2]))
        type_map = {"float": "f4", "double": "f8", "uchar": "u1",
                    "char": "i1", "short": "i2", "ushort": "u2",
                    "int": "i4", "uint": "u4"}
        endian = "<" if "little" in fmt else ">"
        dtype = np.dtype([(name, endian + type_map[t]) for t, name in props])
        if fmt == "ascii":
            names = [n for _, n in props]
            rows = [f.readline().split() for _ in range(n_vtx)]
            arr = np.asarray(rows, dtype=float)
            return arr[:, names.index("label")].astype(np.int64)
        data = np.frombuffer(f.read(dtype.itemsize * n_vtx), dtype=dtype,
                             count=n_vtx)
        return data["label"].astype(np.int64)


def main():
    parser = argparse.ArgumentParser(
        description="Extract ScanNet GT vertex labels to txt")
    parser.add_argument("--data_path", default="data/input/Datasets/ScanNet")
    parser.add_argument("--scenes", nargs="+", default=[])
    parser.add_argument("--scannet200", action="store_true")
    args = parser.parse_args()

    root = Path(args.data_path)
    out_dir = root / ("scannet200_gt" if args.scannet200 else "semantic_gt")
    out_dir.mkdir(parents=True, exist_ok=True)
    scenes = args.scenes or [p.name for p in root.iterdir()
                             if p.is_dir() and p.name.startswith("scene")]
    for scene in scenes:
        suffix = ("_vh_clean_2.labels200.ply" if args.scannet200
                  else "_vh_clean_2.labels.ply")
        mesh = root / scene / f"{scene}{suffix}"
        if not mesh.exists():
            print(f"missing {mesh}, skipping")
            continue
        labels = read_ply_labels(mesh)
        out = out_dir / f"{scene}.txt"
        with open(out, "w") as f:
            f.write("\n".join(str(int(v)) for v in labels))
        print(f"{scene}: {len(labels)} vertices -> {out}")


if __name__ == "__main__":
    main()

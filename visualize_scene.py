#!/usr/bin/env python
"""Offline scene viewer: load a finished run's checkpoint, color the map by
instance / RGB, and render free-text query heatmaps.

Reference behavior: /root/reference/visualize_scene.py:14-66. With open3d
installed this opens an interactive window; headless it exports colored PLY
snapshots under ``<scene>/vis_out``.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ovo_tpu.viz.visualizer import Visualizer
from run_eval import load_representation


def main(args):
    scene_path = Path(args.scene_path)
    ovo, map_params = load_representation(scene_path, eval=True)
    points = np.asarray(map_params["xyz"])
    obj_ids = np.asarray(map_params["obj_ids"]).reshape(-1)
    colors = np.asarray(map_params.get("color")) \
        if map_params.get("color") is not None else None

    viz = Visualizer(ovo, output_dir=scene_path / "vis_out")
    viz.visualize_and_query(points, obj_ids, colors, queries=args.queries)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("scene_path",
                        help="run output dir containing ovo_map.ckpt")
    parser.add_argument("--queries", nargs="*", default=[],
                        help="free-text queries to render as heatmaps")
    main(parser.parse_args())

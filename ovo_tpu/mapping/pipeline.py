"""OVOSemMap-equivalent pipeline orchestrator.

Reference behavior: /root/reference/ovo/entities/ovomapping.py:29-243 -- the
per-frame loop with track/map/segment cadences, semantic loop-closure
trigger, deferred-CLIP draining, fps/spf/memory stats with the same names,
and the two-part ovo_map.ckpt checkpoint.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from ..data.datasets import get_dataset
from ..slam import get_slam_backbone
from ..utils import io as io_utils
from ..utils.logging import Logger
from .semantic import SemanticMapper


class OVOSemMap:
    def __init__(self, config: Dict[str, Any], output_path,
                 mask_source=None, embedder=None, dataset=None) -> None:
        self.output_path = Path(output_path)
        self.output_path.mkdir(exist_ok=True, parents=True)
        io_utils.save_dict_to_yaml(config, "config.yaml",
                                   directory=self.output_path)
        config["output_path"] = str(self.output_path)
        self.config = config

        self.map_every = config["mapping"].get("map_every", 10)
        self.segment_every = config["semantic"].get("segment_every", 10)
        tracking = config.get("tracking") or {}
        self.track_every = tracking.get("track_every", 1)

        self.logger = Logger(self.output_path,
                             use_wandb=config.get("use_wandb", False))
        if dataset is None:
            dataset = get_dataset(config["dataset_name"])(
                {**config["data"], **config["cam"]})
        self.dataset = dataset

        cam_intrinsics = np.asarray(self.dataset.intrinsics, np.float32)
        if mask_source is None or embedder is None:
            from ..factory import build_embedder, build_mask_source

            mask_source = mask_source or build_mask_source(
                config["semantic"], config["data"].get("scene_name"))
            embedder = embedder or build_embedder(config["semantic"])
        self.ovo = SemanticMapper(config["semantic"], self.logger,
                                  config["data"].get("scene_name"),
                                  cam_intrinsics, mask_source=mask_source,
                                  embedder=embedder)
        self.slam_backbone = get_slam_backbone(config, self.dataset,
                                               cam_intrinsics)

        self.first_frame = 0
        if config.get("restore_map", False):
            assert config["slam"].get("slam_module", "vanilla") == "vanilla", \
                "Restoring representation only implemented for 'vanilla'!"
            self.restore_representation()
            self.first_frame = max(self.slam_backbone.estimated_c2ws) + 1

    # ------------------------------------------------------------------
    def save_representation(self) -> None:
        ckpt = {
            "map_params": self.slam_backbone.get_map_dict(),
            "ovo_map_params": self.ovo.capture_dict(
                debug_info=self.config.get("debug", False)),
        }
        io_utils.save_dict_to_ckpt(ckpt, "ovo_map.ckpt",
                                   directory=self.output_path)
        if self.config["slam"].get("save_estimated_cam", False):
            np.save(self.output_path / "estimated_c2w.npy",
                    self.slam_backbone.get_cam_dict(), allow_pickle=True)

    def restore_representation(self) -> None:
        ckpt_path = self.output_path / "ovo_map.ckpt"
        assert ckpt_path.exists(), f"Missing checkpoint: {ckpt_path}"
        ckpt = io_utils.load_ckpt(ckpt_path)
        self.ovo.restore_dict(ckpt["ovo_map_params"],
                              debug_info=self.config.get("debug", False))
        self.slam_backbone.set_map_dict(ckpt["map_params"])
        c2w_path = self.output_path / "estimated_c2w.npy"
        if c2w_path.exists():
            cams = np.load(c2w_path, allow_pickle=True).item()
            self.slam_backbone.set_cam_dict(cams)
        else:
            print(f"Missing cameras positions to restore: {c2w_path}")
            print("Restoring without camera positions!")

    # ------------------------------------------------------------------
    def run(self) -> None:
        spf = []
        t_start = time.time()
        for frame_id in range(self.first_frame, len(self.dataset)):
            on_cadence = (self.track_every == 1
                          or frame_id % self.track_every == 0
                          or frame_id % self.map_every == 0
                          or frame_id % self.segment_every == 0)
            if not on_cadence:
                continue
            frame_data = self.dataset[frame_id]
            self.slam_backbone.track_camera(frame_data)
            c2w = self.slam_backbone.get_c2w(frame_id)
            missing_depth = not (frame_data[2] > 0).any()
            if c2w is None or missing_depth:
                continue

            t_lc = 0.0
            if (frame_id % self.map_every == 0
                    or self.config["slam"]["slam_module"].startswith("orbslam")):
                self.slam_backbone.map(frame_data, c2w)
                if self.slam_backbone.map_updated:
                    t0 = time.time()
                    map_state = self.slam_backbone.get_map()
                    new_state = self.ovo.update_map(
                        map_state, self.slam_backbone.get_kfs())
                    if new_state is not None:
                        self.slam_backbone.update_pcd_obj_ids(new_state)
                    self.slam_backbone.map_updated = False
                    t_lc = time.time() - t0
                    print(f"Sem LC update took {t_lc};")

            t_sem = 0.0
            if frame_id % self.segment_every == 0:
                t0 = time.time()
                # segmentation runs on the full-res image when the dataset
                # provides one (ScanNet 5-tuple, ovomapping.py:166-177)
                image = frame_data[4] if len(frame_data) == 5 else frame_data[1]
                if (self.dataset.height != image.shape[0]
                        or self.dataset.width != image.shape[1]):
                    ratio = (image.shape[0] / self.dataset.dataset_config["H"],
                             image.shape[1] / self.dataset.dataset_config["W"],
                             self.dataset.crop_edge)
                else:
                    ratio = ()
                scene_data = (frame_id, image, frame_data[2], ratio)
                map_state = self.slam_backbone.get_map()
                new_state = self.ovo.detect_and_track_objects(
                    scene_data, map_state, c2w)
                if new_state is not None:
                    self.slam_backbone.update_pcd_obj_ids(new_state)
                self.ovo.compute_semantic_info()
                self.logger.log_memory_usage(frame_id)
                t_sem = time.time() - t0

            if t_sem + t_lc > 0:
                spf.append(t_sem + t_lc)

        self.ovo.complete_semantic_info()
        t_end = time.time()
        fps = len(self.dataset) / self.segment_every / (t_end - t_start)

        self.logger.log_fps(fps)
        self.logger.log_spf(spf)
        self.logger.log_max_memory_usage()
        self.logger.write_stats()
        self.logger.print_final_stats()
        self.save_representation()

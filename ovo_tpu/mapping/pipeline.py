"""OVOSemMap-equivalent pipeline orchestrator.

Reference behavior: /root/reference/ovo/entities/ovomapping.py:29-243 -- the
per-frame loop with track/map/segment cadences, semantic loop-closure
trigger, deferred-CLIP draining, fps/spf/memory stats with the same names,
and the two-part ovo_map.ckpt checkpoint.
"""
from __future__ import annotations

import os
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
        # top-level debug_info gates the semantic core's per-keyframe debug
        # records (reference ovomapping.py:58)
        config.setdefault("semantic", {})["debug_info"] = \
            config.get("debug_info", False)
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
        # mask precompute hook (ovomapping.py:62-63 + mask_generator.py:
        # 122-195): segment every segment-cadence frame once with the live
        # model, save npy masks, then run SAM-free from disk
        sam_cfg = config["semantic"].get("sam", {})
        if sam_cfg.get("precompute", False) and not sam_cfg.get(
                "precomputed", False):
            mask_source = self._precompute_masks(mask_source, sam_cfg)

        self.ovo = SemanticMapper(config["semantic"], self.logger,
                                  config["data"].get("scene_name"),
                                  cam_intrinsics, mask_source=mask_source,
                                  embedder=embedder)
        self.slam_backbone = get_slam_backbone(config, self.dataset,
                                               cam_intrinsics)

        # live-viewer stream + cross-process query handshake
        # (ovomapping.py:128-135,190-207)
        # kernel-level tracing (SURVEY 5.1: reference has only wall timing;
        # here a jax.profiler trace of the first N segment steps on demand)
        self.profile_trace = config.get("profile_trace")
        self.profile_trace_steps = int(config.get("profile_trace_steps", 3))
        self._trace_state = 0  # 0 idle, >0 steps traced, -1 done

        vis_cfg = config.get("vis") or {}
        self.stream = bool(vis_cfg.get("stream", False))
        self.show_stream = bool(vis_cfg.get("show_stream", False))
        self.pcd_queue = None
        self.query_pipe = None
        self.query_flag = None
        self.viewer_proc = None

        self.first_frame = 0
        if config.get("restore_map", False):
            assert config["slam"].get("slam_module", "vanilla") == "vanilla", \
                "Restoring representation only implemented for 'vanilla'!"
            self.restore_representation()
            self.first_frame = max(self.slam_backbone.estimated_c2ws) + 1

    # ------------------------------------------------------------------
    def _precompute_masks(self, mask_source, sam_cfg):
        from ..data.masks import PrecomputedMaskSource

        scene = self.config["data"].get("scene_name", "scene")
        base = sam_cfg.get("masks_base_path",
                           str(self.output_path / "masks"))
        store = PrecomputedMaskSource(
            os.path.join(base, scene) if scene not in base else base,
            max_masks=self.config["semantic"].get(
                "capacity", {}).get("n_masks", 96))
        seg_every = self.segment_every
        for fid in range(0, len(self.dataset), seg_every):
            fd = self.dataset[fid]
            image = fd[4] if len(fd) == 5 else fd[1]
            seg, bmaps, valid = mask_source.get_masks(image, fid)
            if seg is None:
                continue
            n = int(np.asarray(valid).sum())
            store.save_masks(np.asarray(seg),
                             np.asarray(bmaps)[:n], fid)
        print(f"[ovo_tpu] precomputed masks for "
              f"{len(range(0, len(self.dataset), seg_every))} frames "
              f"-> {store.masks_path}")
        return store

    # ------------------------------------------------------------------
    def save_representation(self) -> None:
        map_params = self.slam_backbone.get_map_dict()
        ckpt = {
            "map_params": map_params,
            "ovo_map_params": self.ovo.capture_dict(
                debug_info=self.config.get("debug", False),
                map_dict=map_params),
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
    def enable_stream(self, spawn_process: bool = True, queries=None):
        """Set up the viewer stream. With ``spawn_process`` a separate OS
        process runs ``viz.visualizer.stream_pcd`` (headless it exports
        snapshots and can issue scripted ``queries``); without, the caller
        gets the viewer-side handles (queue, conn, flag) to drive the
        handshake directly (used by tests)."""
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        self._stream_has_queries = bool(queries)
        self.pcd_queue = ctx.Queue()
        self.query_flag = ctx.Value("i", 0)
        parent_conn, child_conn = ctx.Pipe()
        self.query_pipe = parent_conn
        if spawn_process:
            from ..viz.visualizer import stream_pcd

            cam = self.config.get("cam", {})
            cam_arg = None
            if {"fx", "fy", "cx", "cy", "H", "W"} <= set(cam):
                K = np.array([[cam["fx"], 0, cam["cx"]],
                              [0, cam["fy"], cam["cy"]],
                              [0, 0, 1]], np.float64)
                cam_arg = (K, int(cam["H"]), int(cam["W"]))
            self.viewer_proc = ctx.Process(
                target=stream_pcd,
                args=(self.pcd_queue, child_conn, self.query_flag,
                      str(self.output_path / "stream_out"),
                      self.show_stream, queries, cam_arg))
            self.viewer_proc.start()
            return None
        return self.pcd_queue, child_conn, self.query_flag

    def _stream_frame(self, c2w=None) -> None:
        state = self.slam_backbone.get_map()
        n = int(state.count)
        self.pcd_queue.put((np.asarray(state.points[:n]),
                            np.asarray(state.obj_ids[:n]),
                            np.asarray(state.colors[:n]),
                            None if c2w is None else np.asarray(c2w)))

    def _serve_stream_query(self, timeout: float = 30.0) -> None:
        """Mapper side of the query round-trip (ovomapping.py:200-207):
        flag==1 -> recv query, drain the CLIP queue, compute per-point
        similarities, send them back, flag=2."""
        with self.query_flag.get_lock():
            pending = self.query_flag.value == 1
        if not pending or not self.query_pipe.poll(timeout):
            return
        query = self.query_pipe.recv()
        if getattr(self.ovo, "_pending", None):
            # sam_batch > 1: buffered keyframes must be segmented/associated
            # before querying, or their instances would be invisible
            new_state = self.ovo.flush_segmentation(
                self.slam_backbone.get_map())
            if new_state is not None:
                self.slam_backbone.update_pcd_obj_ids(new_state)
        self.ovo.complete_semantic_info()
        state = self.slam_backbone.get_map()
        n = int(state.count)
        obj_ids = np.asarray(state.obj_ids[:n])
        from ..viz.visualizer import Visualizer

        vals = Visualizer(self.ovo).query_values_per_point(obj_ids, query)
        self.query_pipe.send(vals)
        with self.query_flag.get_lock():
            self.query_flag.value = 2

    def _close_stream(self) -> None:
        if self.pcd_queue is not None:
            # grace period: the viewer may not have consumed the last frame
            # or may have a query in flight
            t0 = time.time()
            while time.time() - t0 < 5.0:
                self._serve_stream_query(timeout=0.05)
                try:
                    drained = self.pcd_queue.qsize() == 0
                except NotImplementedError:  # macOS
                    drained = True
                with self.query_flag.get_lock():
                    idle = self.query_flag.value == 0
                if drained and idle:
                    break
                time.sleep(0.02)
            self.pcd_queue.put(None)
        if self.viewer_proc is not None:
            # keep answering the query protocol while waiting: a slow viewer
            # (loaded machine) may issue its scripted queries only after the
            # run ended, and an unanswered flag=1 stalls it for its full
            # per-query timeout before it can write the final exports.
            # Without scripted queries there is nothing to wait for beyond
            # the final exports, so a wedged viewer only delays exit 30 s.
            cap = 300 if getattr(self, "_stream_has_queries", False) else 30
            t0 = time.time()
            while self.viewer_proc.is_alive() and time.time() - t0 < cap:
                self._serve_stream_query(timeout=0.05)
                self.viewer_proc.join(timeout=0.5)
            if self.viewer_proc.is_alive():
                self.viewer_proc.terminate()
            self.viewer_proc = None
        elif self.pcd_queue is not None:
            # no consumer: the queue's feeder thread would block interpreter
            # shutdown on unflushed frames
            self.pcd_queue.cancel_join_thread()

    # ------------------------------------------------------------------
    def _frame_schedule(self):
        return [fid for fid in range(self.first_frame, len(self.dataset))
                if (self.track_every == 1 or fid % self.track_every == 0
                    or fid % self.map_every == 0
                    or fid % self.segment_every == 0)]

    def run(self) -> None:
        if self.stream and self.pcd_queue is None:
            self.enable_stream(spawn_process=True)
        spf = []
        t_start = time.time()

        # SPSC host prefetch: disk IO + decode overlap device compute
        # (SURVEY 5.8 double-buffered feeding; the reference reads frames
        # synchronously in-loop, ovomapping.py:141)
        import queue as _queue
        import threading

        schedule = self._frame_schedule()
        prefetch: _queue.Queue = _queue.Queue(maxsize=4)

        def _producer():
            for fid in schedule:
                prefetch.put((fid, self.dataset[fid]))
            prefetch.put(None)

        producer = threading.Thread(target=_producer, daemon=True)
        producer.start()

        while True:
            item = prefetch.get()
            if item is None:
                break
            frame_id, frame_data = item
            self.slam_backbone.track_camera(frame_data)
            c2w = self.slam_backbone.get_c2w(frame_id)
            missing_depth = not (frame_data[2] > 0).any()
            if c2w is None or missing_depth:
                continue

            t_lc = 0.0
            slam_module = self.config["slam"]["slam_module"]
            do_map = (frame_id % self.map_every == 0
                      or slam_module.startswith("orbslam"))
            do_seg = frame_id % self.segment_every == 0
            # When the vanilla backbone maps on the segment cadence, the
            # insert fuses INTO the association program (one dispatch,
            # shared projection/gathers; bit-exact with the two-step flow,
            # PERF.md 6n / tests/test_association.py) -- the reference's
            # single detect_and_track_objects call site
            # (ovomapping.py:164-188)
            fuse_this = (do_map and do_seg and slam_module == "vanilla"
                         and getattr(self.slam_backbone,
                                     "supports_fused_insert", False)
                         and self.ovo.sam_batch == 1
                         and not self.ovo.point_shard)
            if do_map and not fuse_this:
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
            if do_seg:
                if self.profile_trace and self._trace_state == 0:
                    import jax

                    jax.profiler.start_trace(str(self.profile_trace))
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
                if fuse_this:
                    # growth/bookkeeping first (it may swap the state
                    # buffer), THEN take the map handle
                    insert = self.slam_backbone.fused_insert_args(frame_data)
                    map_state = self.slam_backbone.get_map()
                    new_state = self.ovo.detect_and_track_objects(
                        scene_data, map_state, c2w, insert=insert)
                    if new_state is None:
                        # no masks segmented: the frame must still map
                        self.slam_backbone.map(frame_data, c2w)
                    else:
                        self.slam_backbone.update_pcd_obj_ids(new_state)
                        self.slam_backbone.post_insert()
                else:
                    map_state = self.slam_backbone.get_map()
                    new_state = self.ovo.detect_and_track_objects(
                        scene_data, map_state, c2w)
                    if new_state is not None:
                        self.slam_backbone.update_pcd_obj_ids(new_state)
                self.ovo.compute_semantic_info()
                self.logger.log_memory_usage(frame_id)
                t_sem = time.time() - t0
                if self.pcd_queue is not None:
                    self._stream_frame(c2w)
                    self._serve_stream_query()
                if self.profile_trace and self._trace_state >= 0:
                    self._trace_state += 1
                    if self._trace_state > self.profile_trace_steps:
                        import jax

                        jax.profiler.stop_trace()
                        self._trace_state = -1

            if t_sem + t_lc > 0:
                spf.append(t_sem + t_lc)

        if self.profile_trace and self._trace_state > 0:
            import jax

            jax.profiler.stop_trace()
            self._trace_state = -1
        if getattr(self.ovo, "_pending", None):
            # sam_batch > 1: segment + associate any still-buffered keyframes
            new_state = self.ovo.flush_segmentation(
                self.slam_backbone.get_map())
            if new_state is not None:
                self.slam_backbone.update_pcd_obj_ids(new_state)
        self.ovo.complete_semantic_info()
        self._close_stream()
        t_end = time.time()
        fps = len(self.dataset) / self.segment_every / (t_end - t_start)

        self.logger.log_fps(fps)
        self.logger.log_spf(spf)
        self.logger.log_max_memory_usage()
        dropped = getattr(self.ovo, "n_dropped_masks_total", lambda: 0)()
        if dropped:
            print(f"WARNING: {dropped} masks were dropped at instance "
                  f"capacity over the whole scene -- the instance map is "
                  f"incomplete (enable capacity.grow_instances)")
            self.logger.log_ovo_stats({"frame_id": -1,
                                       "n_dropped_masks": dropped})
        self.logger.write_stats()
        self.logger.print_final_stats()
        self.save_representation()

"""Semantic mapping core: the OVO-equivalent orchestrator.

Reference behavior: class OVO (/root/reference/ovo/entities/ovo.py). Host
code here only sequences jitted device programs and manages the deferred-CLIP
keyframe queue; all per-keyframe math runs in ``associate_keyframe`` and the
embedder's device programs over fixed-capacity buffers.

Pluggable backends (duck-typed):
  mask_source.get_masks(image, frame_id) ->
      (seg_map (H,W) i32, binary_maps (M,H,W) bool, valid (M,) bool)
  embedder.clip_dim
  embedder.embed_masks(image u8 (H,W,3), binary_maps, valid) -> (M, D) f32
  embedder.embed_text(texts: list[str]) -> (Q, D) f32 (normalized)
  embedder.similarity(txt_embeds (Q,D), ins_desc (N,D)) -> (N, Q)
"""
from __future__ import annotations

import time
from collections import deque
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from . import instances as inst
from .association import associate_keyframe
from .instances import InstanceStore, init_instance_store
from .loop_closure import semantic_loop_closure
from .map_state import MapState

_MEDOID_FUSIONS = ("l1_medoid", "cossim_medoid")


def instance_pixel_map(fused_maps, ins_ids, keep):
    """(M, H, W) fused masks + (M,) instance ids -> (H, W) i32 per-pixel
    instance map, -1 where uncovered. Replicates the reference debug_info
    rasterization (ovo.py:231-236): masks written in slot order, LATER
    slots overwriting earlier on overlap (slot order follows seg-map index
    order in both implementations)."""
    import jax

    @jax.jit
    def _run(fused_maps, ins_ids, keep):
        ids = jnp.where(keep & (ins_ids >= 0), ins_ids, -1)
        cover = fused_maps & (ids >= 0)[:, None, None]
        M = fused_maps.shape[0]
        last = (M - 1) - jnp.argmax(cover[::-1], axis=0)       # (H, W)
        covered = jnp.any(cover, axis=0)
        return jnp.where(covered, ids[last], -1).astype(jnp.int32)

    return _run(fused_maps, ins_ids, keep)


class SemanticMapper:
    """Holds the instance store + keyframe queue and drives the per-keyframe
    device programs. Mirrors OVO's public surface: detect_and_track_objects,
    compute/complete_semantic_info, update_map, query, classify_instances,
    capture_dict/restore_dict (ovo.py:121,326,330,366,473,495,529,551)."""

    def __init__(self, config: Dict[str, Any], logger=None,
                 scene_name: Optional[str] = None,
                 cam_intrinsics: Optional[np.ndarray] = None,
                 eval: bool = False, mask_source=None, embedder=None) -> None:
        if not eval:
            assert cam_intrinsics is not None, \
                "Camera intrinsics required for reconstruction!"
        self.config = config
        self.logger = logger
        self.cam_intrinsics = (jnp.asarray(cam_intrinsics, jnp.float32)
                               if cam_intrinsics is not None else None)
        self.mask_source = mask_source
        self.embedder = embedder

        clip_cfg = config.get("clip", {})
        self.n_top_views = int(clip_cfg.get("k_top_views", 0))
        self.fusion = clip_cfg.get("fusion", "l1_medoid")
        self.clip_dim = (embedder.clip_dim if embedder is not None
                         else int(clip_cfg.get("clip_dim", 1024)))

        caps = config.get("capacity", {})
        self.n_instances = int(caps.get("n_instances", 1024))
        # the reference mints unbounded (ovo.py:271-276): grow the store in
        # power-of-2 buckets BEFORE a keyframe could overflow it (off only
        # for tests that pin a fixed capacity)
        self.grow_instances = bool(caps.get("grow_instances", True))
        n_slots_cfg = int(caps.get("top_k_slots", 16))
        # unbounded top-k (reference default k_top_views=10000): no gating
        self.unbounded_top_k = (self.n_top_views <= 0
                                or self.n_top_views > n_slots_cfg)
        n_slots = (n_slots_cfg if self.unbounded_top_k
                   else max(self.n_top_views, 1))
        self.store: InstanceStore = init_instance_store(
            self.n_instances, self.clip_dim, n_slots=n_slots,
            store_slot_descs=self.fusion in _MEDOID_FUSIONS)

        self.match_distance_th = float(config.get("match_distance_th", 0.05))
        self.track_th = int(config.get("track_th", 100))
        self.use_depth_filter = bool(config.get("depth_filter", False))
        self.kf_queue_delay = int(config.get("kf_queue_delay", 0))
        self.th_centroid = float(config.get("th_centroid", 1.5))
        self.th_cossim = float(config.get("th_cossim", 0.81))
        self.th_points = float(config.get("th_points", 0.1))
        self.log = bool(config.get("log", False))

        self.keyframes_queue: deque = deque()
        self.kf_id = 0
        # lazy device-side accumulator of masks lost to instance-capacity
        # overflow (zero whenever grow_instances is on); fetched only at
        # scene end / on demand so the hot path never syncs on it
        self._dropped_dev = jnp.zeros((), jnp.int32)
        # async next_id mirror: the online hot path must NOT fetch
        # store.next_id per keyframe (a fetch is a ~30 ms round trip on
        # the tunneled TPU runtime AND serializes the device chain). After
        # each association the post-assoc next_id is requested async and
        # harvested one keyframe later; in between, the bound grows by M
        # per keyframe (max minting). Growth checks and the active_cols
        # bucket only need an UPPER bound, and the harvested value is
        # deterministic, so compiled shapes stay reproducible.
        self._nid_reqs: deque = deque()           # (device scalar, kf_at)
        self._nid_known = (0, 0)                  # (next_id, kf_at)
        # deferred empty-mask warnings (device mask sources, non-debug):
        # the validity flag is checked one keyframe late instead of
        # forcing a sync before association can even dispatch
        self._valid_req: List[tuple] = []         # (frame_id, valid dev)
        self.frame_ids: List[int] = []    # kf_id -> dataset frame id
        self._time_cache: List[float] = []
        # per-(kf, instance) descriptor record for deleted-keyframe hygiene
        # (the reference's keyframes["ins_descriptors"], ovo.py:50-60):
        # kf_id -> (ins_ids (M,), descs (M, D) f32, keep (M,)), device-
        # resident (no fetch in the hot path; ~0.4 MB per keyframe)
        self.kf_descriptors: Dict[int, tuple] = {}

        # debug_info mode (reference ovo.yaml:20 / ovo.py:32,231-236): keep
        # the per-keyframe association record (matched instance ids + mask
        # areas) and the per-pixel instance map so capture_dict can emit
        # the reference-exact debug checkpoint layout (ovo.py:538-549,
        # instance3d.py:191-209). Host-side numpy, like the reference's
        # .cpu() copies.
        self.debug_info = bool(config.get("debug_info", False))
        self.kf_records: Dict[int, tuple] = {}   # kf -> (ins_ids, areas) np
        self.kf_ins_maps: Dict[int, np.ndarray] = {}

        # SAM micro-batching (perf knob, default off = exact reference
        # cadence): masks are map-independent, so B segment-keyframes can
        # share one batched SAM/embedder program while association stays
        # strictly sequential per keyframe. Association of a buffered frame
        # then runs (B-1)*segment_every frames later against the
        # correspondingly fuller map -- the same deferral family as the
        # reference's kf_queue_delay on the CLIP side (ovo.py:326-332).
        sam_cfg = config.get("sam", {})
        self.sam_batch = int(sam_cfg.get("batch", 1))
        self._pending: List[tuple] = []   # (frame_id, image, depth, ratio, c2w)

        # -- multi-chip gating (SURVEY 2.7 / 5.8): the map's point axis
        # shards across the mesh for association, the text query shards the
        # instance axis, and the batched embedder runs data-parallel over
        # keyframes. All default OFF (single-chip); results are
        # bit-identical either way (tests/test_parallel.py).
        par_cfg = config.get("parallel", {}) or {}
        self.point_shard = bool(par_cfg.get("point_shard", False))
        self.shard_query = bool(par_cfg.get("shard_query", False))
        self.dp_embed = bool(par_cfg.get("dp_embed", False))
        self._mesh = None

    @property
    def mesh(self):
        if self._mesh is None:
            from ..parallel.mesh import make_mesh
            import jax as _jax
            n = len(_jax.devices())
            self._mesh = make_mesh(shape=(n, 1))  # all devices on dp
        return self._mesh

    # ------------------------------------------------------------------
    # Per-keyframe association
    # ------------------------------------------------------------------

    def detect_and_track_objects(self, frame_data, map_state: MapState,
                                 c2w, insert: Optional[Dict[str, Any]] = None
                                 ) -> Optional[MapState]:
        """frame_data: (frame_id, image, depth, rgb_depth_ratio).

        ``insert``: when set, the keyframe's vanilla map insert FUSES into
        the association program (one dispatch, shared projection/gathers --
        bit-exact with the two-step map() -> associate flow,
        tests/test_association.py; PERF.md 6n). Keys: colors (insert-grid
        or full-res u8 image), insert_match_th, k_pooling, downscale,
        active_rows. The pipeline requests this whenever the vanilla
        backbone maps on the segment cadence (the reference's single
        detect_and_track_objects call site, ovomapping.py:164-188)."""
        frame_id, image, depth, rgb_depth_ratio = frame_data

        if (self.sam_batch > 1
                and hasattr(self.mask_source, "get_masks_batch")):
            assert insert is None, "fused insert requires sam_batch == 1"
            self._pending.append((frame_id, image, depth, rgb_depth_ratio,
                                  np.asarray(c2w)))
            if len(self._pending) < self.sam_batch:
                return None
            return self.flush_segmentation(map_state)

        t0 = time.time()
        # upload the frame ONCE: the segmentation and the (deferred)
        # embedder read the same pixels, and on this sandbox the
        # host->device link is slow enough (~tens of ms per MB) that a
        # duplicate 2.4 MB upload is measurable; jnp.asarray on an
        # already-device array is free
        image = jnp.asarray(image)
        seg_map, binary_maps, mask_valid = self.mask_source.get_masks(
            image, frame_id)
        if seg_map is None:
            print(f"No mask segmented in {frame_id}!")
            return None
        if isinstance(mask_valid, np.ndarray) or self.debug_info or self.log:
            # host mask sources (and debug/log runs, which accept syncs):
            # the reference's skip-on-empty check, exact
            if not bool(np.asarray(mask_valid).any()):
                print(f"No mask segmented in {frame_id}!")
                return None
        else:
            # device mask source on the hot path: checking validity here
            # would force a full sync of the AMG chain before association
            # can dispatch. Proceed optimistically -- association with
            # zero valid masks is a no-op on instance state (no votes, no
            # mints, no id writes; the enqueued keyframe carries
            # keep=False everywhere) -- and warn one keyframe late
            # (_drain_async).
            try:
                mask_valid.copy_to_host_async()
            except Exception:
                pass
            self._valid_req.append((frame_id, mask_valid))
        t_sam = time.time() - t0
        return self._associate(frame_id, image, depth, rgb_depth_ratio, c2w,
                               seg_map, binary_maps, mask_valid, map_state,
                               t_sam, insert=insert)

    def _nid_upper_bound(self, m_masks: int) -> int:
        """Host-known bound >= store.next_id with NO sync (see __init__
        notes): last harvested value + m_masks per keyframe since. The
        harvests happen in _drain_async AFTER a frame's dispatches, so
        their round trips overlap device compute."""
        nid, kf_at = self._nid_known
        return nid + m_masks * (self.kf_id - kf_at)

    def _drain_async(self) -> None:
        """Harvest async values from PREVIOUS keyframes (their chains are
        done or nearly; the fetch round trip overlaps the just-dispatched
        frame's device work). The newest nid request stays pending -- its
        chain was dispatched this frame and fetching it would sync."""
        while len(self._nid_reqs) > 1:
            arr, kf_at = self._nid_reqs.popleft()
            if kf_at > self._nid_known[1]:
                self._nid_known = (int(np.asarray(arr)), kf_at)
        for frame_id, valid in self._valid_req:
            if not bool(np.asarray(valid).any()):
                print(f"No mask segmented in {frame_id}!")
        self._valid_req = []

    def flush_segmentation(self, map_state: MapState) -> Optional[MapState]:
        """Segment all buffered keyframes in one batched SAM program, then
        associate each strictly in order against the evolving map."""
        if not self._pending:
            return None
        pending, self._pending = self._pending, []
        t0 = time.time()
        imgs = np.stack([p[1] for p in pending])
        seg_b, bmaps_b, valid_b = self.mask_source.get_masks_batch(
            imgs, [p[0] for p in pending])
        t_sam = time.time() - t0
        out = None
        for j, (frame_id, image, depth, ratio, c2w) in enumerate(pending):
            if not bool(np.asarray(valid_b[j]).any()):
                print(f"No mask segmented in {frame_id}!")
                continue
            new_state = self._associate(
                frame_id, image, depth, ratio, c2w, seg_b[j], bmaps_b[j],
                valid_b[j], map_state if out is None else out,
                t_sam / len(pending))
            if new_state is not None:
                out = new_state
        return out

    def _associate(self, frame_id, image, depth, rgb_depth_ratio, c2w,
                   seg_map, binary_maps, mask_valid, map_state,
                   t_sam, insert: Optional[Dict[str, Any]] = None
                   ) -> Optional[MapState]:
        M = binary_maps.shape[0]
        if self.log and self.logger is not None:
            last_id = int(self.store.next_id)    # exact, for the stats
            nid_ub = last_id
            self._nid_reqs.clear()
            self._nid_known = (last_id, self.kf_id)
        else:
            last_id = None
            nid_ub = self._nid_upper_bound(M)
        # Preemptive growth: a keyframe can mint at most M instances, so
        # growing whenever next_id + M could cross capacity guarantees the
        # association program NEVER drops a mask to capacity overflow
        # (reference minting is unbounded, ovo.py:271-276). nid_ub >=
        # next_id, so the bound only ever grows EARLIER.
        if self.grow_instances and nid_ub + M > self.store.capacity:
            new_cap = max(self.store.capacity * 2,
                          1 << (nid_ub + M - 1).bit_length())
            print(f"[semantic] growing instance store "
                  f"{self.store.capacity} -> {new_cap} "
                  f"(next_id<={nid_ub})")
            self.store = inst.grow_instance_store(self.store, new_cap)
        t0 = time.time()
        ratio = tuple(rgb_depth_ratio) if len(rgb_depth_ratio) else None
        # vote-matrix column bucket: next_id + the frame's max minting (M)
        # always fits, so the one-hot vote matmul scales with LIVE
        # instances, not capacity (power-of-2 -> a handful of recompiles)
        a_cols = 1 << max(nid_ub + M - 1, 127).bit_length()
        a_cols = a_cols if a_cols < self.store.capacity else None
        if insert is not None:
            from .association import associate_and_insert_keyframe

            assert not self.point_shard, \
                "fused insert is single-chip (point_shard runs two-step)"
            map_state, self.store, match = associate_and_insert_keyframe(
                map_state, self.store, seg_map, binary_maps, mask_valid,
                jnp.asarray(insert["colors"]),
                jnp.asarray(depth, jnp.float32),
                jnp.asarray(c2w, jnp.float32),
                self.cam_intrinsics, jnp.asarray(self.kf_id, jnp.int32),
                match_distance_th=self.match_distance_th,
                track_th=self.track_th,
                use_depth_filter=self.use_depth_filter,
                unbounded_top_k=self.unbounded_top_k,
                rgb_depth_ratio=ratio,
                insert_match_th=insert["insert_match_th"],
                k_pooling=insert["k_pooling"],
                downscale=insert["downscale"],
                active_rows=insert.get("active_rows"),
                active_cols=a_cols)
        elif self.point_shard:
            from ..parallel.shard import sharded_associate_keyframe
            map_state, self.store, match = sharded_associate_keyframe(
                self.mesh, map_state, self.store, seg_map, binary_maps,
                mask_valid, jnp.asarray(depth, jnp.float32),
                jnp.asarray(c2w, jnp.float32), self.cam_intrinsics,
                jnp.asarray(self.kf_id, jnp.int32),
                match_distance_th=self.match_distance_th,
                track_th=self.track_th,
                use_depth_filter=self.use_depth_filter,
                unbounded_top_k=self.unbounded_top_k,
                rgb_depth_ratio=ratio)
        else:
            map_state, self.store, match = associate_keyframe(
                map_state, self.store, seg_map, binary_maps, mask_valid,
                jnp.asarray(depth, jnp.float32), jnp.asarray(c2w, jnp.float32),
                self.cam_intrinsics, jnp.asarray(self.kf_id, jnp.int32),
                match_distance_th=self.match_distance_th,
                track_th=self.track_th,
                use_depth_filter=self.use_depth_filter,
                unbounded_top_k=self.unbounded_top_k, rgb_depth_ratio=ratio,
                active_cols=a_cols)

        self._dropped_dev = self._dropped_dev + match.n_dropped_masks
        # COPY the scalar out of the store pytree: later calls donate the
        # store, which deletes its buffers -- a stashed view would die
        nid_dev = jnp.copy(self.store.next_id)
        try:
            nid_dev.copy_to_host_async()
        except Exception:
            pass
        self._nid_reqs.append((nid_dev, self.kf_id))
        self.keyframes_queue.append(
            dict(ins_ids=match.ins_ids, keep=match.keep,
                 fused_maps=match.fused_maps, image=image, kf_id=self.kf_id))
        self.frame_ids.append(frame_id)
        if self.debug_info:
            # reference parity: record matched ids + areas (Instance3D
            # kfs_ids/top_kf bookkeeping) and the per-pixel instance map
            # (ovo.py:231-236); fetched now like the reference's .cpu()
            self.kf_records[self.kf_id] = (np.asarray(match.ins_ids),
                                           np.asarray(match.areas))
            self.kf_ins_maps[self.kf_id] = np.asarray(
                instance_pixel_map(match.fused_maps, match.ins_ids,
                                   match.keep))
        self.kf_id += 1

        if self.log and self.logger is not None:
            match.n_matched.block_until_ready()
            t_obj = time.time() - t0
            stats = {
                "frame_id": frame_id,
                "n_obj": [int(self.store.next_id) - last_id],
                "n_matches": int(match.n_matched),
                "t_sam": round(t_sam, 2),
                "t_obj": round(t_obj, 3),
            }
            dropped = int(match.n_dropped_masks)
            if dropped:
                stats["n_dropped_masks"] = dropped
                print(f"WARNING: {dropped} masks dropped at instance "
                      f"capacity {self.store.capacity} in frame {frame_id}")
            self.logger.log_ovo_stats(stats, print_output=True)
        self._drain_async()
        return map_state

    def n_dropped_masks_total(self) -> int:
        """Total masks ever lost to instance-capacity overflow (always 0
        when ``grow_instances`` is on). Forces one device fetch."""
        return int(np.asarray(self._dropped_dev))

    # ------------------------------------------------------------------
    # Deferred CLIP extraction (the keyframe pipeline, ovo.py:326-364)
    # ------------------------------------------------------------------

    def compute_semantic_info(self) -> None:
        # pop one keyframe per segment step (ovo.py:326-332); with SAM
        # micro-batching the queue grows by sam_batch per flush, so pop in
        # matching batches through the batched embedder program
        n = 0
        while (len(self.keyframes_queue) > self.kf_queue_delay
               and n < max(self.sam_batch, 1)):
            take = min(max(self.sam_batch, 1),
                       len(self.keyframes_queue) - self.kf_queue_delay)
            self._compute_semantic_info(take)
            n += take

    def complete_semantic_info(self) -> None:
        while self.keyframes_queue:
            self._compute_semantic_info(
                min(max(self.sam_batch, 1), len(self.keyframes_queue)))

    def _compute_semantic_info(self, take: int = 1) -> None:
        kfs = [self.keyframes_queue.popleft() for _ in range(take)]
        keeps = []
        for kf in kfs:
            keep = kf["keep"]
            if not self.unbounded_top_k:
                # re-filter: the kf may have been evicted from an instance's
                # top-k during the queue delay (ovo.py:340-347)
                keep = keep & inst.is_top_kf(
                    self.store, kf["ins_ids"],
                    jnp.asarray(kf["kf_id"], jnp.int32))
            keeps.append(keep)
        if self.debug_info or self.log or self.unbounded_top_k is False:
            # debug/log runs (syncs acceptable) and bounded-top-k gating
            # keep the exact skip-on-empty check
            any_keep = [bool(np.asarray(k).any()) for k in keeps]
            if not any(any_keep):
                return
        else:
            # hot path: checking keep here forces a sync on the popped
            # keyframe's association chain. Embed optimistically -- rows
            # with keep=False are dropped by update_descriptors, so an
            # (extremely rare) all-empty keyframe just wastes one embed.
            any_keep = [True] * len(keeps)

        t0 = time.time()
        use_batch = (len(kfs) > 1
                     and hasattr(self.embedder, "embed_masks_batch")
                     and all(any_keep))
        if use_batch:
            imgs = np.stack([kf["image"] for kf in kfs])
            maps = jnp.stack([kf["fused_maps"] for kf in kfs])
            keepb = jnp.stack(keeps)
            if self.dp_embed:
                descs_list = self._dp_embed_batch(imgs, maps, keepb)
            else:
                descs_list = self.embedder.embed_masks_batch(imgs, maps,
                                                             keepb)
        else:
            descs_list = [
                self.embedder.embed_masks(kf["image"], kf["fused_maps"], k)
                if ok else None
                for kf, k, ok in zip(kfs, keeps, any_keep)]
        t_clip = time.time() - t0

        t0 = time.time()
        for kf, keep, ok, descs in zip(kfs, keeps, any_keep, descs_list):
            if not ok:
                continue
            descs32 = descs.astype(jnp.float32)
            self.store = inst.update_descriptors(
                self.store, kf["ins_ids"], descs32,
                jnp.asarray(kf["kf_id"], jnp.int32), keep,
                fusion=self.fusion)
            self.kf_descriptors[kf["kf_id"]] = (kf["ins_ids"], descs32, keep)
        if self.log and self.logger is not None:
            self.store.clip_feature.block_until_ready()
            t_up = time.time() - t0
            self.logger.log_ovo_stats({
                "frame_id": self.frame_ids[kfs[-1]["kf_id"]],
                "t_clip": round(t_clip, 2),
                "t_up": round(t_up, 3),
            }, print_output=True)

    def _dp_embed_batch(self, imgs, maps, keepb):
        """Data-parallel keyframe embedding: the batch axis shards over the
        mesh's dp axis (GSPMD partitions the one vmapped embedder program;
        params stay replicated). Pads the batch to the mesh size."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        b = imgs.shape[0]
        n_dev = self.mesh.shape["dp"]
        pad = (-b) % n_dev
        if pad:
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            maps = jnp.concatenate([maps, jnp.repeat(maps[-1:], pad, 0)])
            keepb = jnp.concatenate([keepb, jnp.repeat(keepb[-1:], pad, 0)])
        sh = NamedSharding(self.mesh, P("dp"))
        descs = self.embedder.embed_masks_batch(
            _jax.device_put(jnp.asarray(imgs), sh),
            _jax.device_put(maps, sh), _jax.device_put(keepb, sh))
        return descs[:b]

    # ------------------------------------------------------------------
    # Loop closure
    # ------------------------------------------------------------------

    def update_map(self, map_state: MapState, kfs=None) -> MapState:
        """Semantic loop-closure update (ovo.py:366-424): drain the CLIP
        queue, drop descriptors of keyframes the SLAM backbone culled
        (``kfs`` = surviving dataset frame ids, ovo.py:372-379), then fuse
        overlapping instances and refresh descriptors."""
        flushed = self.flush_segmentation(map_state)
        if flushed is not None:
            map_state = flushed
        self.complete_semantic_info()
        if kfs is not None:
            surviving = set(kfs)
            culled = [k for k in range(self.kf_id)
                      if self.frame_ids[k] not in surviving]
            self.drop_keyframes(culled)
        map_state, self.store, fused = semantic_loop_closure(
            map_state, self.store, self.th_centroid, self.th_cossim,
            self.th_points)
        if fused:
            self._remap_kf_descriptors(fused)
        return map_state

    def drop_keyframes(self, culled_kf_ids: Sequence[int]) -> None:
        """Remove culled keyframes' descriptor contributions and top-kf
        slots, re-fusing every touched instance (ovo.py:372-379,423)."""
        if not culled_kf_ids:
            return
        recs = [self.kf_descriptors.pop(k) for k in culled_kf_ids
                if k in self.kf_descriptors]
        if recs:
            ids = jnp.concatenate([r[0] for r in recs])
            descs = jnp.concatenate([r[1] for r in recs])
            keep = jnp.concatenate([r[2] for r in recs])
        else:
            ids = jnp.zeros((1,), jnp.int32)
            descs = jnp.zeros((1, self.clip_dim), jnp.float32)
            keep = jnp.zeros((1,), jnp.bool_)
        # pad the batch and the culled list to power-of-2 buckets so the
        # rare LC-time program compiles only a handful of specializations
        def bucket(n):
            b = 1
            while b < n:
                b *= 2
            return b

        B = bucket(ids.shape[0])
        if B != ids.shape[0]:
            padn = B - ids.shape[0]
            ids = jnp.concatenate([ids, jnp.full((padn,), -1, ids.dtype)])
            descs = jnp.concatenate(
                [descs, jnp.zeros((padn, descs.shape[1]), descs.dtype)])
            keep = jnp.concatenate([keep, jnp.zeros((padn,), jnp.bool_)])
        culled = np.asarray(culled_kf_ids, np.int32)
        C = bucket(len(culled))
        culled = np.concatenate([culled, np.full(C - len(culled), -2,
                                                 np.int32)])
        self.store = inst.drop_keyframe_descriptors(
            self.store, ids, descs, keep, jnp.asarray(culled),
            fusion=self.fusion)

    def _remap_kf_descriptors(self, fused: Dict[int, int]) -> None:
        """Point per-kf descriptor records of merged instances at their
        survivor so later keyframe culls subtract from the right row
        (ovo.py:412-419)."""
        remap = np.arange(self.store.capacity, dtype=np.int32)
        for j, i in fused.items():
            remap[j] = i
        for _ in range(4):  # chase merge chains
            remap = remap[remap]
        remap_j = jnp.asarray(remap)
        for k, (ids, descs, keep) in list(self.kf_descriptors.items()):
            new_ids = jnp.where(
                ids >= 0, remap_j[jnp.clip(ids, 0, self.store.capacity - 1)],
                ids)
            self.kf_descriptors[k] = (new_ids, descs, keep)
        # debug records follow the merge too (the reference's
        # fuse_instances merges kfs_ids/points_ids/top_kf into the
        # survivor, instance_utils.py:26-35)
        for k, (ids, areas) in list(self.kf_records.items()):
            new_ids = np.where(ids >= 0,
                               remap[np.clip(ids, 0, len(remap) - 1)], ids)
            self.kf_records[k] = (new_ids, areas)
        # NOTE kf_ins_maps stay as recorded: the reference remaps only the
        # descriptor dict on fusion (ovo.py:412-419), never the stored
        # ins_maps snapshots

    # ------------------------------------------------------------------
    # Query / classification (ovo.py:473-527)
    # ------------------------------------------------------------------

    def active_ids(self) -> np.ndarray:
        return np.where(np.asarray(self.store.active))[0]

    def get_objs_clips(self) -> jnp.ndarray:
        ids = self.active_ids()
        return self.store.clip_feature[jnp.asarray(ids, jnp.int32)]

    def query(self, queries: Sequence[str],
              templates: Sequence[str] = ("{}",)) -> np.ndarray:
        """(n_instances, n_queries) similarity map, instance rows in active-id
        order (matching the reference's objects-dict iteration order)."""
        ids = self.active_ids()
        assert len(ids) > 0, "No 3D instances to query!"
        obj_clips = self.get_objs_clips()
        if isinstance(templates, str):
            templates = [templates]
        txt = []
        for q in queries:
            # per-query template ensemble, each query embedded independently
            # (clip_generator.py:186-196)
            embeds = self.embedder.embed_text(
                [t.format(q) for t in templates])
            mean = np.asarray(embeds).mean(0)
            txt.append(mean / max(np.linalg.norm(mean), 1e-12))
        txt = jnp.asarray(np.stack(txt), jnp.float32)
        if self.shard_query:
            from ..parallel.shard import sharded_similarity
            return np.asarray(sharded_similarity(
                self.mesh, self.embedder.similarity, txt, obj_clips))
        return np.asarray(self.embedder.similarity(txt, obj_clips))

    def classify_instances(self, classes: Sequence[str],
                           template="This is a photo of a {}",
                           th: float = 0.0) -> Dict[str, np.ndarray]:
        sim = self.query(classes, template if isinstance(template, (list, tuple))
                         else [template])
        cls = sim.argmax(axis=1)
        conf = sim[np.arange(len(cls)), cls]
        cls = np.where(conf <= th, -1, cls)
        conf = np.where(conf <= th, 0.0, conf)
        return {"classes": cls, "conf": conf, "ids": self.active_ids()}

    # ------------------------------------------------------------------
    # Checkpointing (ovo.py:529-576 key layout)
    # ------------------------------------------------------------------

    def capture_dict(self, debug_info: bool = False,
                     map_dict: Optional[Dict[str, Any]] = None
                     ) -> Dict[str, Any]:
        """Reference-exact checkpoint dict (ovo.py:529-549 +
        instance3d.py:191-209). With ``debug_info`` the dict additionally
        carries, per instance, ``ins3d_<id>_keyframes_ids`` (every keyframe
        the instance matched, in kf order), ``ins3d_<id>_points_ids``
        (point ids currently assigned in the map -- derived from
        ``map_dict``; the reference itself prefers the map's
        point_ins_ids over the never-pruned per-object lists,
        instance3d.py:245-249), ``ins3d_<id>_top_kfs`` ((area, kf_id)
        pairs in valid-heap order), plus ``frame_id``, the stacked
        ``ins_map`` snapshots, and the per-(kf, instance)
        ``kf_<i>_ins3d_<j>_clips`` descriptors."""
        ids = self.active_ids()
        out: Dict[str, Any] = {"ins_3d_ids": np.asarray(ids)}
        feats = np.asarray(self.store.clip_feature)
        has = np.asarray(self.store.has_clip)
        for i in ids:
            out[f"ins3d_{i}_clip_feature"] = feats[i] if has[i] else None
            out[f"ins3d_{i}_clip_feature_kf"] = 0 if has[i] else None
        if not debug_info:
            return out

        out["frame_id"] = np.asarray(self.frame_ids)
        # per-instance kf/area records from the association-time snapshots
        kfs_of: Dict[int, list] = {int(i): [] for i in ids}
        tops_of: Dict[int, list] = {int(i): [] for i in ids}
        for kf in sorted(self.kf_records):
            rec_ids, rec_areas = self.kf_records[kf]
            for j in np.nonzero(rec_ids >= 0)[0]:
                i = int(rec_ids[j])
                if i in kfs_of:
                    kfs_of[i].append(kf)
                    tops_of[i].append((int(rec_areas[j]), kf))
        bounded = not self.unbounded_top_k
        top_area = np.asarray(self.store.top_area) if bounded else None
        top_kf = np.asarray(self.store.top_kf) if bounded else None
        pts_ids = pts_obj = None
        if map_dict is not None:
            pts_ids = np.asarray(map_dict["ids"])
            pts_obj = np.asarray(map_dict["obj_ids"])
        for i in ids:
            i = int(i)
            out[f"ins3d_{i}_keyframes_ids"] = np.asarray(kfs_of[i],
                                                         np.int64)
            if pts_ids is not None:
                out[f"ins3d_{i}_points_ids"] = pts_ids[pts_obj == i]
            else:
                out[f"ins3d_{i}_points_ids"] = np.zeros((0,), np.int64)
            if bounded:
                vs = top_area[i] >= 0
                pairs = np.stack([top_area[i][vs], top_kf[i][vs]],
                                 axis=1).astype(np.int64)
                # ascending (area, kf) is a valid min-heap ordering
                order = np.lexsort((pairs[:, 1], pairs[:, 0]))
                out[f"ins3d_{i}_top_kfs"] = pairs[order]
            else:
                # unbounded k_top_views (reference default 10000): every
                # matched keyframe enters the heap
                out[f"ins3d_{i}_top_kfs"] = np.asarray(
                    sorted(tops_of[i]), np.int64).reshape(-1, 2)
        if self.kf_ins_maps:
            out["ins_map"] = np.stack(
                [self.kf_ins_maps[k] for k in sorted(self.kf_ins_maps)])
        else:
            out["ins_map"] = np.zeros((0, 1, 1), np.int32)
        for kf, (d_ids, d_descs, d_keep) in self.kf_descriptors.items():
            d_ids_np = np.asarray(d_ids)
            d_keep_np = np.asarray(d_keep)
            d_descs_np = np.asarray(d_descs)
            for j in np.nonzero(d_keep_np & (d_ids_np >= 0))[0]:
                out[f"kf_{kf}_ins3d_{int(d_ids_np[j])}_clips"] = \
                    d_descs_np[j]
        return out

    def restore_dict(self, scene_dict: Dict[str, Any],
                     debug_info: bool = False) -> None:
        """Consume a reference-layout checkpoint (ovo.py:551-576), including
        legacy ``default_<id>_*`` keys (instance3d.py old_restore)."""
        ids = np.asarray(scene_dict["ins_3d_ids"]).astype(np.int64)
        if len(ids) and ids.max() >= self.n_instances:
            self.store = init_instance_store(
                int(ids.max()) + 1, self.clip_dim,
                n_slots=self.store.n_slots,
                store_slot_descs=self.fusion in _MEDOID_FUSIONS)

        def get(i, field):
            v = scene_dict.get(f"ins3d_{i}_{field}")
            if v is None:
                v = scene_dict.get(f"default_{i}_{field}")  # old_restore
            return v

        active = np.zeros(self.store.capacity, bool)
        feats = np.zeros((self.store.capacity, self.clip_dim), np.float32)
        has = np.zeros(self.store.capacity, bool)
        n_points = np.zeros(self.store.capacity, np.int32)
        for i in ids:
            active[i] = True
            f = get(i, "clip_feature")
            if f is not None:
                feats[i] = np.asarray(f, np.float32).reshape(-1)[:self.clip_dim]
                has[i] = True
        desc_sum = feats.copy()
        desc_cnt = has.astype(np.int32)

        if debug_info:
            self.frame_ids = [int(x) for x in
                              np.asarray(scene_dict["frame_id"]).ravel()]
            self.kf_id = len(self.frame_ids)
            # per-kf instance-map snapshots (reference splits the stacked
            # array back per keyframe, ovo.py:570)
            ins_map = scene_dict.get("ins_map")
            self.kf_ins_maps = {}
            if ins_map is not None and len(np.asarray(ins_map)):
                arr = np.asarray(ins_map)
                for k in range(min(len(arr), self.kf_id)):
                    self.kf_ins_maps[k] = arr[k]
            # per-instance records
            self.kf_records = {}
            rec: Dict[int, Dict[int, int]] = {}
            for i in ids:
                i = int(i)
                kfs = get(i, "keyframes_ids")
                tops = get(i, "top_kfs")
                areas_of = {}
                if tops is not None:
                    for area, kf in np.asarray(tops).reshape(-1, 2):
                        areas_of[int(kf)] = int(area)
                if kfs is not None:
                    for kf in np.asarray(kfs).ravel():
                        rec.setdefault(int(kf), {})[i] = \
                            areas_of.get(int(kf), 0)
                pts = get(i, "points_ids")
                if pts is not None:
                    n_points[i] = len(np.asarray(pts).ravel())
                if tops is not None and not self.unbounded_top_k:
                    pairs = np.asarray(tops).reshape(-1, 2).astype(np.int64)
                    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
                    pairs = pairs[order][-self.store.n_slots:]
                    ta = np.asarray(self.store.top_area)
                    tk = np.asarray(self.store.top_kf)
                    ta[i, :len(pairs)] = pairs[:, 0]
                    tk[i, :len(pairs)] = pairs[:, 1]
                    self.store = self.store._replace(
                        top_area=jnp.asarray(ta), top_kf=jnp.asarray(tk))
            for kf, ins_areas in rec.items():
                rids = np.fromiter(ins_areas.keys(), np.int32,
                                   len(ins_areas))
                rareas = np.fromiter(ins_areas.values(), np.int32,
                                     len(ins_areas))
                self.kf_records[kf] = (rids, rareas)
            # per-(kf, instance) descriptors -> kf_descriptors + the
            # streaming (sum, count) fusion state they imply
            self.kf_descriptors = {}
            desc_sum[:] = 0.0
            desc_cnt[:] = 0
            for kf in range(self.kf_id):
                d_ids, d_descs = [], []
                for i in ids:
                    d = scene_dict.get(f"kf_{kf}_ins3d_{int(i)}_clips")
                    if d is not None:
                        d = np.asarray(d, np.float32).reshape(-1)
                        d_ids.append(int(i))
                        d_descs.append(d[:self.clip_dim])
                        desc_sum[int(i)] += d[:self.clip_dim]
                        desc_cnt[int(i)] += 1
                if d_ids:
                    self.kf_descriptors[kf] = (
                        jnp.asarray(np.asarray(d_ids, np.int32)),
                        jnp.asarray(np.stack(d_descs)),
                        jnp.ones((len(d_ids),), jnp.bool_))
            # instances with a fused feature but no stored per-kf clips
            # fall back to the non-debug streaming state (feature counts
            # as one view) so later keyframe drops stay well-defined
            orphan = (desc_cnt == 0) & has
            desc_sum[orphan] = feats[orphan]
            desc_cnt[orphan] = 1

        self.store = self.store._replace(
            active=jnp.asarray(active),
            clip_feature=jnp.asarray(feats),
            has_clip=jnp.asarray(has),
            desc_sum=jnp.asarray(desc_sum),
            desc_cnt=jnp.asarray(desc_cnt),
            n_points=jnp.asarray(n_points),
            next_id=jnp.asarray(int(ids.max()) + 1 if len(ids) else 0,
                                jnp.int32),
        )

#!/usr/bin/env python
"""End-to-end keyframe-throughput benchmark on the attached TPU.

Measures the full per-keyframe semantic hot path at the reference's default
Replica configuration (SURVEY.md section 3.1 call stack), with all state
device-resident exactly as in the online pipeline. The fused
associate+insert program is bit-exact with the pipeline's two-step
map() -> associate flow, including the frame's own fresh points voting in
its association (tests/test_association.py pins the equality), so the
number below measures the shipped semantics:

  SAM2-class AMG (hiera_l @ 1024, 16x16 grid prompts, NMS, seg map)
  -> projective association over a 2M-point map (frustum/match/votes/fusion)
  -> TextRegion per-segment embedding (PE-Core-L14-336, multi-res crops,
     masked-pool Pallas kernel)
  -> instance descriptor fusion (streaming mean)

Weights are randomly initialized (checkpoints are not shipped in-image);
shapes, capacities and compute are identical to a weighted run -- every
stage is fixed-shape, so FLOPs do not depend on weight values.

Baseline: the reference publishes NO keyframes/sec (BASELINE.md) -- it only
logs avg_fps per run. ``vs_baseline`` is therefore reported against a
DERIVED ESTIMATE, not a measurement (kept in sync with BASELINE.md):

  reference per-keyframe budget on an RTX-3090-class GPU, per its own
  t_sam/t_obj/t_clip stage structure (logger.py:14-17) at the default
  config (SAM2-hiera-L AMG @ 1024^2 with 16x16 grid prompts; TextRegion
  over PE-Core-L14-336 with multi-res crops; Python _track_objects loop
  with per-mask .item() syncs):
    t_sam ~= 0.45-0.60 s  (Hiera-L encoder + 256-prompt decode + O(N^2)
                           Python mask NMS)
    t_clip ~= 0.20-0.30 s (PE-L forward on 1+crop batch + masked pools)
    t_obj + t_up ~= 0.15-0.25 s (per-mask host syncs dominate)
  => ~0.8-1.15 s/keyframe, i.e. ~1 keyframe/s. REFERENCE_EST_KF_PER_SEC
  pins 1.0. The ratio is an estimate; the absolute kf/s number is the
  measurement.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))

import numpy as np

# Derived estimate, NOT a measurement -- see module docstring + BASELINE.md
REFERENCE_EST_KF_PER_SEC = 1.0

if "OVO_BENCH_PIPELINED" in os.environ:
    sys.stderr.write(
        "[bench] OVO_BENCH_PIPELINED is no longer read: pipelined is the "
        "default; set OVO_BENCH_SYNC=1 for per-frame-synced semantics\n")

H, W = 680, 1200          # Replica frame geometry
N_POINTS = 2 ** 21        # map capacity
N_INSTANCES = 1024
M_MASKS = 96
WARMUP = 2
ITERS = 16   # ~3s of steady-state at ~5 kf/s; halves run-to-run variance


def _wait_for_healthy_worker(max_wait_s: float = 600.0) -> None:
    """The sandbox TPU worker needs recovery time after a crash; probe with
    a small real computation (+ authoritative fetch) before the heavy run."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    while True:
        try:
            x = jnp.ones((1024, 1024), jnp.bfloat16)
            v = float(np.asarray((x @ x)[0, 0]))
            assert v == 1024.0
            return
        except Exception as e:  # noqa: BLE001
            if time.time() - t0 > max_wait_s:
                raise
            sys.stderr.write(f"[bench] worker unhealthy ({type(e).__name__});"
                             " waiting 60s\n")
            sys.stderr.flush()
            time.sleep(60)


def main():
    import jax
    import jax.numpy as jnp

    try:  # persist compiles across crash-retry re-execs: a retry then only
        # re-executes, shrinking the window where the flaky worker can die
        jax.config.update("jax_compilation_cache_dir", "/tmp/ovo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    _wait_for_healthy_worker()

    from ovo_tpu.mapping import association, instances as inst
    from ovo_tpu.mapping.instances import init_instance_store
    from ovo_tpu.mapping.map_state import init_map_state, map_insert_frame
    from ovo_tpu.models.clip import CLIPModel
    from ovo_tpu.models.sam.amg import AutomaticMaskSource
    from ovo_tpu.models.sam.model import SAMModel
    from ovo_tpu.models.textregion import TextRegionEmbedder

    encoder = os.environ.get("OVO_BENCH_SAM", "hiera_l")
    sam_size = int(os.environ.get("OVO_BENCH_SAM_SIZE", "1024"))

    def bf16_params(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    sam = SAMModel.random_init(encoder, image_size=sam_size)
    sam.params = bf16_params(sam.params)   # halve the HBM weight footprint
    amg = AutomaticMaskSource(sam, points_per_side=16, max_masks=M_MASKS,
                              pred_iou_thresh=0.0, stability_thresh=0.0,
                              nms_score_th=0.0)
    clip = CLIPModel.random_init("PE-Core-L14-336")
    clip.params = bf16_params(clip.params)
    embedder = TextRegionEmbedder(clip)

    rng = np.random.default_rng(0)
    K = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)
    # distinct frames, pre-staged on device (the online pipeline overlaps
    # its one small H2D per frame with compute); the insert-grid color
    # buffer is sliced on the HOST during staging (image[::2, ::2] is a
    # ~0.2 ms numpy copy overlapped with device compute) so the program
    # skips a ~2.4 ms u8 relayout chain per keyframe (PERF.md 6w)
    _imgs_np = [(rng.random((H, W, 3)) * 255).astype(np.uint8)
                for _ in range(4)]
    images = [jnp.asarray(a) for a in _imgs_np]
    images_ds = [jnp.asarray(np.ascontiguousarray(a[::2, ::2]))
                 for a in _imgs_np]
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)

    state = init_map_state(N_POINTS)
    state = map_insert_frame(state, images[0], jnp.asarray(depth),
                             jnp.asarray(c2w), jnp.asarray(K))
    store = init_instance_store(N_INSTANCES, clip.cfg.clip_dim)
    depth_dev = jnp.asarray(depth)
    c2w_dev = jnp.asarray(c2w)
    K_dev = jnp.asarray(K)

    import jax as _jax

    @_jax.jit
    def sync_probe(state, store):
        # one tiny array depending on BOTH chains (association/map insert
        # and the descriptor path) -> a single authoritative fetch per frame
        return store.desc_cnt[:8].sum() + state.count

    @functools.partial(_jax.jit, donate_argnums=(0,))
    def update_and_probe(store, ins_ids, descs, kf, keep, count):
        # descriptor update + the probe scalar in ONE program: each extra
        # dispatch costs ~0.23 ms on this tunneled runtime, and the timed
        # loop pays it per keyframe
        store = inst.update_descriptors.__wrapped__(
            store, ins_ids, descs, kf, keep)
        return store, store.desc_cnt[:8].sum() + count

    # occupied-bucket bound for the association's per-point ops (PERF.md
    # 6p): set after warmup from the REAL count + generous growth slack,
    # and re-verified against the final count after timing (the run is
    # invalid if it ever overflowed, so crash loudly rather than report).
    active_rows = [None]
    active_cols = [None]   # vote-matrix instance-axis bucket (>= next_id)

    def assoc_frame(state, store, seg, bmaps, valid, img, kf_id):
        # fused association + vanilla map insert: one program, shared
        # active-bucket projection and pixel gathers
        return association.associate_and_insert_keyframe(
            state, store, seg, bmaps, valid, img, depth_dev, c2w_dev, K_dev,
            jnp.asarray(kf_id, jnp.int32), match_distance_th=0.05,
            track_th=100, use_depth_filter=True, unbounded_top_k=True,
            k_pooling=3, downscale=2, active_rows=active_rows[0],
            active_cols=active_cols[0])

    def keyframe_step(state, store, kf_id):
        img = images[kf_id % len(images)]
        seg, bmaps, valid = amg.get_masks(img, kf_id)
        state, store, match = assoc_frame(state, store, seg, bmaps, valid,
                                          images_ds[kf_id % len(images)],
                                          kf_id)
        descs = embedder.embed_masks(img, match.fused_maps, match.keep)
        store, probe = update_and_probe(
            store, match.ins_ids, descs.astype(jnp.float32),
            jnp.asarray(kf_id, jnp.int32), match.keep, state.count)
        return state, store, match, probe

    # micro-batching SAM via vmap measured slightly SLOWER on-chip (5.30 vs
    # 5.61 kf/s: vmap batches matmuls instead of growing their M dims), so
    # serial is the default; the capability stays for future native-batch
    # encoders
    sam_batch = int(os.environ.get("OVO_BENCH_SAM_BATCH", "1"))

    def keyframe_batch_step(state, store, kf_id0):
        """B keyframes: SAM + TextRegion micro-batched (map-independent),
        association strictly sequential per keyframe (map-dependent)."""
        imgs = jnp.stack([images[(kf_id0 + j) % len(images)]
                          for j in range(sam_batch)])
        seg_b, bmaps_b, valid_b = amg.get_masks_batch(
            imgs, list(range(kf_id0, kf_id0 + sam_batch)))
        matches = []
        for j in range(sam_batch):
            state, store, match = assoc_frame(
                state, store, seg_b[j], bmaps_b[j], valid_b[j],
                images_ds[(kf_id0 + j) % len(images)], kf_id0 + j)
            matches.append(match)
        descs_b = embedder.embed_masks_batch(
            imgs, jnp.stack([m.fused_maps for m in matches]),
            jnp.stack([m.keep for m in matches]))
        for j, match in enumerate(matches):
            store = inst.update_descriptors(
                store, match.ins_ids, descs_b[j].astype(jnp.float32),
                jnp.asarray(kf_id0 + j, jnp.int32), match.keep)
        return state, store, matches[-1]

    # warmup compiles + executes each stage with a sync in between (short
    # device bursts; the sandbox worker has crashed on very long first-run
    # chains). Timed iterations below run the full async chain.
    for i in range(WARMUP):
        sys.stderr.write(f"[bench] warmup {i}\n")
        sys.stderr.flush()
        img = images[i % len(images)]
        seg, bmaps, valid = amg.get_masks(img, i)
        np.asarray(valid[:4])
        sys.stderr.write("[bench]   amg done\n")
        sys.stderr.flush()
        state, store, match = association.associate_and_insert_keyframe(
            state, store, seg, bmaps, valid, images_ds[i % len(images)],
            depth_dev, c2w_dev, K_dev,
            jnp.asarray(i, jnp.int32), match_distance_th=0.05, track_th=100,
            use_depth_filter=True, unbounded_top_k=True, k_pooling=3,
            downscale=2)
        np.asarray(state.count)
        sys.stderr.write("[bench]   assoc+insert done\n")
        sys.stderr.flush()
        descs = embedder.embed_masks(img, match.fused_maps, match.keep)
        store = inst.update_descriptors(
            store, match.ins_ids, descs.astype(jnp.float32),
            jnp.asarray(i, jnp.int32), match.keep)
        np.asarray(sync_probe(state, store))
        sys.stderr.write("[bench]   embed+update done\n")
        sys.stderr.flush()
    # pick the active-rows bucket: the deterministic scene's dedup keeps
    # growth tiny after warmup (observed ~260 rows/frame; 4096/frame of
    # slack is ~16x that). Power-of-2 buckets mirror the online pipeline's
    # grow_map_state policy; the post-run assert below invalidates the run
    # if the bucket ever overflows.
    count_after_warmup = int(np.asarray(state.count))
    need = count_after_warmup + (ITERS + 2) * 4096
    bucket = 1 << max(need - 1, 1).bit_length()
    if bucket < N_POINTS:
        active_rows[0] = bucket
    # vote-matrix column bucket: the warmed scene's next_id + per-frame
    # minting slack (the deterministic 4-image cycle mints ~0 instances
    # after warmup; 16/frame is ~2 orders of magnitude above observed).
    # The post-run assert below invalidates the run on overflow.
    nid = int(np.asarray(store.next_id))
    cbucket = 1 << max(nid + (ITERS + 2) * 8 - 1, 1).bit_length()
    if cbucket < N_INSTANCES:
        active_cols[0] = cbucket
    sys.stderr.write(f"[bench] count={count_after_warmup} -> active_rows="
                     f"{active_rows[0]} (capacity {N_POINTS}); next_id={nid}"
                     f" -> active_cols={active_cols[0]} (cap {N_INSTANCES})\n")
    sys.stderr.flush()
    # Program-count reduction: the PREVIOUS keyframe's descriptor update
    # (+ the probe) folds INTO this keyframe's association program -- the
    # update touches desc fields only (disjoint from association's
    # active/top/next_id writes) and the deferral is the same family as
    # the pipeline's kf_queue_delay CLIP queue (ovo.py:326-332). 3
    # programs/keyframe instead of 5; each inter-program boundary costs
    # ~0.3 ms of device-side scheduling gap on this runtime. Composing
    # the TOWERS in too (AMG and/or TextRegion inlined into one program)
    # made XLA's compile blow past 50 minutes -- recorded negative
    # (PERF.md r5). Built AFTER bucket selection so the active_rows /
    # active_cols closures are fixed; OVO_BENCH_MEGA=0 falls back.
    mega = os.environ.get("OVO_BENCH_MEGA", "1") != "0" and sam_batch == 1

    @functools.partial(_jax.jit, donate_argnums=(0, 1))
    def assoc_update_probe(state, store, seg, bmaps, valid, img_ds, kf_id,
                           p_ins, p_descs, p_keep, p_kf):
        store = inst.update_descriptors.__wrapped__(
            store, p_ins, p_descs, p_kf, p_keep)
        state, store, match = association.associate_and_insert_keyframe(
            state, store, seg, bmaps, valid, img_ds, depth_dev, c2w_dev,
            K_dev, kf_id, match_distance_th=0.05, track_th=100,
            use_depth_filter=True, unbounded_top_k=True, k_pooling=3,
            downscale=2, active_rows=active_rows[0],
            active_cols=active_cols[0])
        probe = store.desc_cnt[:8].sum() + state.count
        return state, store, match, probe

    pend = [(jnp.full((M_MASKS,), -1, jnp.int32),
             jnp.zeros((M_MASKS, clip.cfg.clip_dim), jnp.float32),
             jnp.zeros((M_MASKS,), jnp.bool_),
             jnp.asarray(-1, jnp.int32))]   # no pending update yet

    def timed_step(state, store, kf_id):
        if not mega:
            return keyframe_step(state, store, kf_id)
        img = images[kf_id % len(images)]
        seg, bmaps, valid = amg.get_masks(img, kf_id)
        kf = jnp.asarray(kf_id, jnp.int32)
        state, store, match, probe = assoc_update_probe(
            state, store, seg, bmaps, valid,
            images_ds[kf_id % len(images)], kf, *pend[0])
        descs = embedder.embed_masks(img, match.fused_maps, match.keep)
        pend[0] = (match.ins_ids, descs.astype(jnp.float32), match.keep, kf)
        return state, store, match, probe

    def drain_pending(store):
        if mega:
            store = inst.update_descriptors(store, *(
                pend[0][0], pend[0][1], pend[0][3], pend[0][2]))
        return store

    if active_rows[0] is not None or mega:
        # compile+run the bucketed/mega program once OUTSIDE the timed loop
        # (disjoint kf id so the timed frames' association stats are clean)
        sys.stderr.write("[bench] compiling timed-loop program\n")
        sys.stderr.flush()
        state, store, _, _p = timed_step(state, store, 20_000)
        np.asarray(_p)
    sys.stderr.write("[bench] warmup done, timing\n")
    sys.stderr.flush()

    if os.environ.get("OVO_BENCH_STAGES") == "1":
        # per-stage breakdown (reference stat names t_sam/t_obj/t_clip).
        # Sync = actual element fetch: block_until_ready is only a hint on
        # this runtime, and each fetch costs a ~30 ms round trip, so report
        # fetch-corrected times.
        import jax

        def fetch(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf.ravel()[:1])

        rtt_t0 = time.time()
        for _ in range(8):
            fetch(sync_probe(state, store))
        rtt = (time.time() - rtt_t0) / 8

        img = images[0]
        for name, fn in (
            ("t_sam", lambda: amg.get_masks(img, 99)),
            # association donates its state buffers; time against copies
            ("t_obj", lambda: association.associate_and_insert_keyframe(
                jax.tree_util.tree_map(jnp.copy, state),
                jax.tree_util.tree_map(jnp.copy, store),
                seg_w, bmaps_w, valid_w, images_ds[0], depth_dev,
                c2w_dev, K_dev, jnp.asarray(99, jnp.int32),
                match_distance_th=0.05, track_th=100, use_depth_filter=True,
                unbounded_top_k=True, k_pooling=3, downscale=2)),
            ("t_clip", lambda: embedder.embed_masks(img, fused_w, keep_w)),
        ):
            if name == "t_sam":
                seg_w, bmaps_w, valid_w = fn()
                fetch(valid_w)
            elif name == "t_obj":
                _, _, match_w = fn()
                fused_w, keep_w = match_w.fused_maps, match_w.keep
                fetch(keep_w)
            else:
                fetch(fn())
            t0 = time.time()
            for _ in range(4):
                fetch(fn())
            t = (time.time() - t0) / 4 - rtt
            sys.stderr.write(f"[bench] {name}: {t:.4f}s (+{rtt:.3f}s rtt)\n")
        sys.stderr.flush()

    # Default: steady-state throughput with the host fetch of frame i-1
    # overlapping frame i's device chain -- exactly how the online pipeline
    # runs (SPSC prefetch + deferred-CLIP queue, ovo.py:326-364).
    # OVO_BENCH_SYNC=1 forces a full per-frame sync instead.
    pipelined = os.environ.get("OVO_BENCH_SYNC") != "1"
    if sam_batch > 1:
        # warm the batched programs once before timing
        sys.stderr.write(f"[bench] warming sam_batch={sam_batch}\n")
        sys.stderr.flush()
        # warm on a disjoint kf-id range so the first timed batch does not
        # re-associate frames the warm-up already inserted
        state, store, _ = keyframe_batch_step(state, store, 10_000)
        np.asarray(sync_probe(state, store))

    n_frames = ITERS * max(sam_batch, 1)
    t0 = time.time()
    if pipelined:
        # steady-state throughput: dispatch frame i, then fetch frame i-1's
        # results -- host fetch overlaps device compute, exactly like the
        # online pipeline's deferred-CLIP queue (ovo.py:326-364)
        prev = None
        for i in range(ITERS):
            if sam_batch > 1:
                state, store, match = keyframe_batch_step(
                    state, store, WARMUP + i * sam_batch)
                probe = sync_probe(state, store)
            else:
                state, store, match, probe = timed_step(
                    state, store, WARMUP + i)
            if prev is not None:
                np.asarray(prev)
            prev = probe
        np.asarray(prev)
    else:
        for i in range(ITERS):
            if sam_batch > 1:
                state, store, match = keyframe_batch_step(
                    state, store, WARMUP + i * sam_batch)
                probe = sync_probe(state, store)
            else:
                state, store, match, probe = timed_step(
                    state, store, WARMUP + i)
            # force full completion of this frame's chain: the probe depends
            # on AMG -> association -> TextRegion -> descriptor update and
            # on the map insert
            np.asarray(probe)
    dt = time.time() - t0
    store = drain_pending(store)

    if active_rows[0] is not None:
        final_count = int(np.asarray(state.count))
        assert final_count <= active_rows[0], (
            f"active_rows bucket overflowed ({final_count} > "
            f"{active_rows[0]}): run invalid")
    if active_cols[0] is not None:
        final_nid = int(np.asarray(store.next_id))
        assert final_nid <= active_cols[0], (
            f"active_cols bucket overflowed ({final_nid} > "
            f"{active_cols[0]}): run invalid")

    fps = n_frames / dt
    print(json.dumps({
        "metric": "keyframes_per_sec_semantic_hot_path",
        "value": round(fps, 3),
        "unit": "keyframes/s",
        "vs_baseline": round(fps / REFERENCE_EST_KF_PER_SEC, 2),
        # the denominator is a DERIVED estimate, not a measurement: the
        # reference publishes no kf/s (BASELINE.md). The +/-25% band on the
        # 1.0 kf/s estimate makes the speedup ratio itself uncertain --
        # carry the resulting ratio band with the number so it cannot be
        # read as a measurement.
        "vs_baseline_band": [round(fps / (REFERENCE_EST_KF_PER_SEC * 1.25), 2),
                             round(fps / (REFERENCE_EST_KF_PER_SEC * 0.75), 2)],
        "baseline_note": "vs derived 1.0 kf/s estimate, +/-25% band",
    }))


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # the sandboxed TPU worker occasionally restarts
        attempt = int(os.environ.get("OVO_BENCH_RETRY", "0"))
        if attempt < 8:
            import traceback
            traceback.print_exc()  # keep the real cause diagnosable
            sys.stderr.write(f"bench attempt {attempt} failed "
                             f"({type(e).__name__}); retrying on a fresh "
                             "runtime\n")
            time.sleep(120)  # the worker needs recovery time after a crash;
            # immediate retries crash again (_wait_for_healthy_worker then
            # probes before the heavy programs start)
            os.environ["OVO_BENCH_RETRY"] = str(attempt + 1)
            if attempt >= 3:
                # persistent crashes: drop to the pure-XLA kernels as a
                # last resort (crashes have historically been concurrent-
                # client contention, not kernel faults, so only late)
                os.environ["OVO_NO_PALLAS"] = "1"
                sys.stderr.write("bench: disabling Pallas kernels for the "
                                 "remaining attempts\n")
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise

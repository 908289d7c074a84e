#!/usr/bin/env python
"""Per-op trace profiler for the keyframe hot-path programs.

Runs a chosen stage (amg | textregion | assoc) a few times under
jax.profiler.trace on the real TPU and aggregates the perfetto events by op
name / source line. Methodology per PERF.md: arguments (not closures), one
authoritative np.asarray fetch, single TPU client.

  python scripts/profile_hot_path.py textregion
  python scripts/profile_hot_path.py amg
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

H, W = 680, 1200
M_MASKS = 96


def aggregate(trace_dir: str, top: int = 40) -> None:
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # keep only device-lane events (XLA ops carry a 'long_name' or 'source')
    by_name = defaultdict(lambda: [0.0, 0])
    by_src = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        args = e.get("args") or {}
        if "long_name" not in args and "source" not in args:
            continue
        dur_ms = e["dur"] / 1e3
        total += dur_ms
        key = e.get("name", "?")
        by_name[key][0] += dur_ms
        by_name[key][1] += 1
        src = args.get("source", "?")
        by_src[src][0] += dur_ms
        by_src[src][1] += 1
    long_names = {}
    for e in events:
        args = e.get("args") or {}
        if "long_name" in args:
            long_names.setdefault(e.get("name", "?"), args["long_name"])
    print(f"\ndevice total (all traced runs): {total:.1f} ms, "
          f"{sum(c for _, c in by_name.values())} events")
    print("\n--- top ops by total time ---")
    for k, (t, c) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:top]:
        ln = long_names.get(k, "")[:160]
        print(f"  {t:8.2f} ms  n={c:4d}  avg={t / c:7.3f}  {k[:60]}\n"
              f"             {ln}")
    print("\n--- top source lines ---")
    for k, (t, c) in sorted(by_src.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {t:8.2f} ms  n={c:4d}  {k[:100]}")


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "textregion"
    reps = int(os.environ.get("PROF_REPS", "3"))
    out_dir = f"/tmp/prof_{stage}"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ovo_tpu.models.clip import CLIPModel
    from ovo_tpu.models.sam.amg import AutomaticMaskSource
    from ovo_tpu.models.sam.model import SAMModel
    from ovo_tpu.models.textregion import TextRegionEmbedder

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    rng = np.random.default_rng(0)
    img_u8 = (rng.random((H, W, 3)) * 255).astype(np.uint8)

    if stage == "textregion":
        clip = CLIPModel.random_init("PE-Core-L14-336")
        clip.params = bf16(clip.params)
        emb = TextRegionEmbedder(clip)
        masks = np.zeros((M_MASKS, H, W), bool)
        for i in range(M_MASKS):
            y0, x0 = (i * 37) % (H - 80), (i * 53) % (W - 80)
            masks[i, y0:y0 + 80, x0:x0 + 80] = True
        run = lambda: np.asarray(  # noqa: E731
            emb.embed_masks(img_u8, jnp.asarray(masks),
                            jnp.ones(M_MASKS, bool)))[0, 0]
    elif stage == "amg":
        sam = SAMModel.random_init(
            os.environ.get("OVO_BENCH_SAM", "hiera_l"), image_size=1024)
        sam.params = bf16(sam.params)
        amg = AutomaticMaskSource(sam, points_per_side=16, max_masks=M_MASKS,
                                  pred_iou_thresh=0.0, stability_thresh=0.0,
                                  nms_score_th=0.0)
        img_dev = jnp.asarray(img_u8)

        def run():
            seg, bmaps, valid = amg.get_masks(img_dev, 0)
            return np.asarray(seg)[0, 0]
    elif stage == "assoc":
        # fused association + map insert at bench shapes (2M-point map,
        # 96 mask slots), synthetic masks so the stage is isolated from
        # SAM. NOTE the program donates state/store -> thread them.
        from ovo_tpu.mapping import association
        from ovo_tpu.mapping.instances import init_instance_store
        from ovo_tpu.mapping.map_state import init_map_state, \
            map_insert_frame

        K = jnp.asarray([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]],
                        jnp.float32)
        c2w = jnp.eye(4, dtype=jnp.float32)
        depth = jnp.asarray(
            rng.uniform(1.0, 3.0, (H, W)).astype(np.float32))
        img = jnp.asarray(img_u8)
        seg = jnp.asarray(
            rng.integers(-1, M_MASKS, (H, W)).astype(np.int32))
        bmaps = jnp.asarray(
            (seg[None] == jnp.arange(M_MASKS)[:, None, None]))
        valid = jnp.ones((M_MASKS,), bool)
        box = {
            "state": map_insert_frame(init_map_state(2 ** 21), img, depth,
                                      c2w, K),
            "store": init_instance_store(2 ** 10, 1024),
            "kf": 1,
        }

        # OVO_PROF_ACTIVE_ROWS=524288 matches the bench's occupied-bucket
        # configuration (PERF.md 6p); unset profiles the full-capacity path
        arows = os.environ.get("OVO_PROF_ACTIVE_ROWS")
        arows = int(arows) if arows else None

        def run():
            box["state"], box["store"], _ = \
                association.associate_and_insert_keyframe(
                    box["state"], box["store"], seg, bmaps, valid, img,
                    depth, c2w, K, jnp.asarray(box["kf"], jnp.int32),
                    match_distance_th=0.05, track_th=100,
                    use_depth_filter=True, unbounded_top_k=True,
                    k_pooling=3, downscale=2, active_rows=arows)
            box["kf"] += 1
            return np.asarray(box["state"].count)
    else:
        raise SystemExit(f"unknown stage {stage}")

    print("warmup/compile ...", flush=True)
    run()
    run()
    print("tracing ...", flush=True)
    with jax.profiler.trace(out_dir):
        for _ in range(reps):
            run()
    aggregate(out_dir)


if __name__ == "__main__":
    main()

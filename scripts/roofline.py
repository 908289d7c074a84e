#!/usr/bin/env python
"""Roofline / MFU accounting for the keyframe hot-path programs.

For each stage of the semantic hot path (SURVEY.md section 3.1: AMG ->
association+insert -> TextRegion) this script reports, per keyframe:

  - FLOPs: XLA's own flop count from ``compiled.cost_analysis()`` of the
    pure-XLA variant (OVO_NO_PALLAS=1). The Pallas kernels compute the
    exact same matmuls, so the XLA-route flop count IS the program's flop
    count; counting it with kernels off avoids the zero-flop custom-call
    blind spot.
  - HBM bytes: summed per-fusion ``bytes_accessed`` from a fresh perfetto
    trace of the SHIPPED program (Pallas routes enabled) -- the measured
    traffic model of what actually runs. Falls back to cost_analysis
    "bytes accessed" when the trace carries no byte counters.
  - Device time: summed device-lane event time per rep from the same trace,
    cross-checked against fetch-corrected wall time.

From these: achieved TFLOP/s and GB/s against the chip's peaks ->
MFU (model flop utilization) and HBM bandwidth utilization, i.e. the
roofline position of every program. Writes ROOFLINE.json and prints a
markdown table for PERF.md.

Usage (single TPU client only -- concurrent clients crash the worker):
  python scripts/roofline.py            # all stages
  python scripts/roofline.py amg        # one stage
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from typing import Callable, Dict, Tuple

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

H, W = 680, 1200
M_MASKS = 96
N_POINTS = 2 ** 21
REPS = 4

# TPU v5e (v5 lite) single-chip peaks: 197 bf16 TFLOP/s, 819 GB/s HBM
# (public spec; the towers run bf16 matmuls with f32 accumulation).
PEAKS = {
    "TPU v5 lite": {"tflops_bf16": 197.0, "hbm_gbps": 819.0},
    "TPU v5e": {"tflops_bf16": 197.0, "hbm_gbps": 819.0},
}


def _device_peaks():
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "?")
    return kind, PEAKS.get(kind, {"tflops_bf16": 197.0, "hbm_gbps": 819.0})


def parse_trace(trace_dir: str) -> Tuple[float, float, int]:
    """-> (total device-op ms, total bytes_accessed, n_events) summed over
    every traced rep. Device ops are the events carrying XLA op metadata
    (long_name / source / bytes_accessed); nested sub-events (hlo_op lanes
    vs fusion lanes) are not double-counted because only leaf op events
    carry those args on this runtime."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    total_ms = 0.0
    total_bytes = 0.0
    n = 0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        args = e.get("args") or {}
        if not ("long_name" in args or "source" in args
                or "bytes_accessed" in args):
            continue
        total_ms += e["dur"] / 1e3
        n += 1
        b = args.get("bytes_accessed")
        if b is not None:
            try:
                total_bytes += float(b)
            except (TypeError, ValueError):
                pass
    return total_ms, total_bytes, n


def stage_builders():
    """stage name -> (build() -> (run_shipped, lower_xla)) where
    run_shipped() executes + fetches one rep of the production program and
    lower_xla() returns compiled-cost flops/bytes of the identical-math
    XLA-only variant."""
    import jax
    import jax.numpy as jnp

    from ovo_tpu.mapping import association
    from ovo_tpu.mapping.instances import init_instance_store
    from ovo_tpu.mapping.map_state import init_map_state, map_insert_frame
    from ovo_tpu.models.clip import CLIPModel
    from ovo_tpu.models.sam.amg import AutomaticMaskSource, _amg_program
    from ovo_tpu.models.sam.model import SAMModel
    from ovo_tpu.models.textregion import TextRegionEmbedder

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    rng = np.random.default_rng(0)
    img_u8 = (rng.random((H, W, 3)) * 255).astype(np.uint8)

    def build_amg():
        sam = SAMModel.random_init(
            os.environ.get("OVO_BENCH_SAM", "hiera_l"), image_size=1024)
        sam.params = bf16(sam.params)
        amg = AutomaticMaskSource(sam, points_per_side=16,
                                  max_masks=M_MASKS, pred_iou_thresh=0.0,
                                  stability_thresh=0.0, nms_score_th=0.0)
        img_dev = jnp.asarray(img_u8)

        def run():
            seg, bmaps, valid = amg.get_masks(img_dev, 0)
            np.asarray(valid[:1])

        def lower():
            img_f = img_dev.astype(jnp.float32) / 255.0
            kwargs = amg._amg_kwargs((H, W))

            def fn(params, image, points):
                return _amg_program(params, amg.model.cfg, image, points,
                                    **kwargs)

            return jax.jit(fn).lower(sam.params, img_f, amg.points)

        return run, lower

    def build_assoc():
        K = jnp.asarray([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]],
                        jnp.float32)
        c2w = jnp.eye(4, dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(1.0, 3.0, (H, W)).astype(np.float32))
        img = jnp.asarray(img_u8)
        seg = jnp.asarray(rng.integers(-1, M_MASKS, (H, W)).astype(np.int32))
        bmaps = jnp.asarray(seg[None] == jnp.arange(M_MASKS)[:, None, None])
        valid = jnp.ones((M_MASKS,), bool)
        kwargs = dict(match_distance_th=0.05, track_th=100,
                      use_depth_filter=True, unbounded_top_k=True,
                      k_pooling=3, downscale=2)
        box = {"state": map_insert_frame(init_map_state(N_POINTS), img,
                                         depth, c2w, K),
               "store": init_instance_store(2 ** 10, 1024), "kf": 1}

        def run():
            box["state"], box["store"], _ = \
                association.associate_and_insert_keyframe(
                    box["state"], box["store"], seg, bmaps, valid, img,
                    depth, c2w, K, jnp.asarray(box["kf"], jnp.int32),
                    **kwargs)
            box["kf"] += 1
            np.asarray(box["state"].count)

        def lower():
            def fn(state, store, seg, bmaps, valid, img, depth, c2w, K, kf):
                return association.associate_and_insert_keyframe(
                    state, store, seg, bmaps, valid, img, depth, c2w, K,
                    kf, **kwargs)

            return jax.jit(fn).lower(
                box["state"], box["store"], seg, bmaps, valid, img, depth,
                c2w, K, jnp.asarray(0, jnp.int32))

        return run, lower

    def build_clip():
        clip = CLIPModel.random_init("PE-Core-L14-336")
        clip.params = bf16(clip.params)
        emb = TextRegionEmbedder(clip)
        masks = np.zeros((M_MASKS, H, W), bool)
        for i in range(M_MASKS):
            y0, x0 = (i * 37) % (H - 80), (i * 53) % (W - 80)
            masks[i, y0:y0 + 80, x0:x0 + 80] = True
        masks_dev = jnp.asarray(masks)
        keep = jnp.ones(M_MASKS, bool)
        img_dev = jnp.asarray(img_u8)

        def run():
            np.asarray(emb.embed_masks(img_dev, masks_dev, keep))[0, 0]

        def lower():
            # pass params as ARGUMENTS: closing over them embeds ~600 MB
            # of weight constants in the HLO (remote compile rejects it)
            from ovo_tpu.models.textregion import _textregion_program

            ch, cw = emb._crop_layout(H, W)
            kw = dict(crop_size=emb.crop_size, patch_size=emb.patch_size,
                      crop_num_h=ch, crop_num_w=cw,
                      remove_global=emb.remove_global_patch,
                      gp_threshold=emb.global_patch_threshold,
                      project=emb.project_and_normalize)

            def fn(params, img, m, mean, std):
                return _textregion_program(params, clip.cfg.vision, img, m,
                                           mean=mean, std=std, **kw)

            img_f = img_dev.astype(jnp.float32) / 255.0
            return jax.jit(fn).lower(clip.params, img_f, masks_dev,
                                     clip._mean, clip._std)

        return run, lower

    return {"t_sam (AMG)": build_amg, "t_obj (assoc+insert)": build_assoc,
            "t_clip (TextRegion)": build_clip}


def main() -> None:
    only = sys.argv[1] if len(sys.argv) > 1 else None
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    kind, peaks = _device_peaks()
    print(f"device: {kind}; peaks {peaks}", flush=True)

    rows = []
    for name, build in stage_builders().items():
        if only and only not in name:
            continue
        print(f"\n=== {name} ===", flush=True)

        # --- 1. FLOPs from the identical-math XLA-only lowering ---
        os.environ["OVO_NO_PALLAS"] = "1"
        jax.clear_caches()
        run, lower = build()
        ca = lower().compile().cost_analysis()
        flops = float(ca.get("flops", 0.0))
        ca_bytes = float(ca.get("bytes accessed", 0.0))
        print(f"  cost_analysis (XLA variant): flops={flops / 1e9:.1f} G, "
              f"bytes={ca_bytes / 1e9:.2f} GB", flush=True)

        # --- 2. trace the SHIPPED program (Pallas routes enabled) ---
        os.environ.pop("OVO_NO_PALLAS", None)
        jax.clear_caches()
        run, lower = build()
        ca_ship = lower().compile().cost_analysis()
        ship_bytes = float(ca_ship.get("bytes accessed", 0.0))
        run()  # compile
        run()  # warm
        trace_dir = f"/tmp/roofline_{name.split()[0]}"
        t0 = time.time()
        with jax.profiler.trace(trace_dir):
            for _ in range(REPS):
                run()
        wall_per_rep = (time.time() - t0) / REPS
        dev_ms_total, bytes_total, nev = parse_trace(trace_dir)
        dev_ms = dev_ms_total / REPS
        traced_bytes = bytes_total / REPS if bytes_total else None
        hbm_bytes = traced_bytes if traced_bytes else ship_bytes
        bytes_src = "trace" if traced_bytes else "cost_analysis"

        tflops = flops / (dev_ms / 1e3) / 1e12 if dev_ms else 0.0
        gbps = hbm_bytes / (dev_ms / 1e3) / 1e9 if dev_ms else 0.0
        mfu = tflops / peaks["tflops_bf16"]
        bwu = gbps / peaks["hbm_gbps"]
        # arithmetic intensity vs the chip's ridge point
        ai = flops / hbm_bytes if hbm_bytes else 0.0
        ridge = peaks["tflops_bf16"] * 1e12 / (peaks["hbm_gbps"] * 1e9)
        bound = "compute" if ai >= ridge else "bandwidth"
        row = {
            "stage": name, "device_ms": round(dev_ms, 2),
            "wall_ms": round(wall_per_rep * 1e3, 1),
            "gflops": round(flops / 1e9, 1),
            "hbm_gb": round(hbm_bytes / 1e9, 3), "bytes_source": bytes_src,
            "achieved_tflops": round(tflops, 1),
            "achieved_gbps": round(gbps, 1),
            "mfu": round(mfu, 3), "hbm_bw_util": round(bwu, 3),
            "arith_intensity": round(ai, 1),
            "ridge_flops_per_byte": round(ridge, 1), "bound": bound,
            "trace_events": nev,
        }
        rows.append(row)
        print(f"  device {dev_ms:.1f} ms/rep (wall {wall_per_rep * 1e3:.1f})"
              f" -> {tflops:.1f} TFLOP/s (MFU {mfu:.1%}), "
              f"{gbps:.0f} GB/s (BW {bwu:.1%}) [{bound}-bound, "
              f"AI {ai:.0f} vs ridge {ridge:.0f}]", flush=True)

    out = {"device": kind, "peaks": peaks, "reps": REPS, "stages": rows}
    with open("ROOFLINE.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\n| stage | dev ms | GFLOP | HBM GB | TFLOP/s | MFU | GB/s | "
          "BW util | bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['stage']} | {r['device_ms']} | {r['gflops']} | "
              f"{r['hbm_gb']} | {r['achieved_tflops']} | "
              f"{r['mfu']:.1%} | {r['achieved_gbps']} | "
              f"{r['hbm_bw_util']:.1%} | {r['bound']} |")


if __name__ == "__main__":
    main()

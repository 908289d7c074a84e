#!/usr/bin/env python
"""Non-trivial end-to-end equality between CPU and the real TPU (VERDICT r4
#3): run the recorded-fixture scenes -- perfect masks (CPU mIoU 1.0000) and
deterministically degraded masks (CPU mIoU 0.5460) -- through the FULL
online pipeline on whatever platform JAX picks, and compare the resulting
mIoU against the recorded CPU values. Unlike the random-weight CLI smoke
(0.00% == 0.00%), these metrics are floor-free: an on-chip semantic
divergence moves them.

Usage:
  python scripts/tpu_fixture_equality.py            # real TPU (no env vars)
  JAX_PLATFORMS=cpu python scripts/tpu_fixture_equality.py   # re-record CPU

Prints one JSON line {"platform", "perfect_miou", "noisy_miou", "ok"} and
exits non-zero when either value differs from the CPU recording by more
than 1e-6 (the pipeline's device math is integer-exact at these shapes, so
the values must MATCH, not merely be close).

Do NOT set PYTHONPATH when running on the TPU (the axon plugin does not
register with it set); this script fixes sys.path itself.
"""
from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import ovo_tpu  # noqa: E402,F401  BEFORE jax: honors JAX_PLATFORMS=cpu
import numpy as np  # noqa: E402

# CPU-recorded values (tests/test_pipeline_e2e.py fixtures; re-record with
# JAX_PLATFORMS=cpu if the fixture generation ever changes)
EXPECT = {"perfect_miou": 1.0, "noisy_miou": 0.546020}
TOL = 1e-6


def run_fixture(mask_fn, tag: str) -> float:
    import tempfile

    from synthetic_scene import (CLASSES, SyntheticWallDataset,
                                 class_embeddings, mask_label_fn)
    from ovo_tpu.data.masks import CallableMaskSource, RecordedEmbedder
    from ovo_tpu.mapping.pipeline import OVOSemMap
    from test_pipeline_e2e import _device_miou, make_config

    ds = SyntheticWallDataset(n_frames=12)
    embeds = class_embeddings(16)
    text = {f"This is a photo of a {c}": embeds[i]
            for i, c in enumerate(CLASSES)}
    text.update({c: embeds[i] for i, c in enumerate(CLASSES)})
    out = tempfile.mkdtemp(prefix=f"fixture_{tag}_")
    sem_map = OVOSemMap(make_config(), out,
                        mask_source=CallableMaskSource(mask_fn,
                                                       max_masks=16),
                        embedder=RecordedEmbedder(16, mask_label_fn, embeds,
                                                  text),
                        dataset=ds)
    sem_map.run()
    return _device_miou(sem_map)


def main() -> int:
    import jax

    from synthetic_scene import noisy_mask_fn, synthetic_mask_fn

    platform = jax.devices()[0].platform
    print(f"[fixture-eq] platform: {platform} "
          f"({getattr(jax.devices()[0], 'device_kind', '?')})",
          file=sys.stderr)
    perfect = run_fixture(synthetic_mask_fn, "perfect")
    print(f"[fixture-eq] perfect-mask mIoU: {perfect:.6f}", file=sys.stderr)
    noisy = run_fixture(noisy_mask_fn, "noisy")
    print(f"[fixture-eq] degraded-mask mIoU: {noisy:.6f}", file=sys.stderr)

    ok = (abs(perfect - EXPECT["perfect_miou"]) <= TOL
          and abs(noisy - EXPECT["noisy_miou"]) <= TOL)
    print(json.dumps({"platform": platform,
                      "perfect_miou": round(perfect, 6),
                      "noisy_miou": round(noisy, 6),
                      "expect": EXPECT, "ok": bool(ok)}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

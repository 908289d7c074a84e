#!/usr/bin/env python
"""A/B timing of the TextRegion embed program: XLA blocks vs fused-Pallas
blocks (OVO_FUSED_BLOCK). One TPU client; authoritative np.asarray syncs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

H, W, M = 680, 1200, 96


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ovo_tpu.models.clip import CLIPModel
    from ovo_tpu.models.textregion import TextRegionEmbedder, \
        _textregion_program

    clip = CLIPModel.random_init("PE-Core-L14-336")
    clip.params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, clip.params)
    emb = TextRegionEmbedder(clip)

    rng = np.random.default_rng(0)
    img = jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))
    masks = np.zeros((M, H, W), bool)
    for i in range(M):
        y0, x0 = (i * 37) % (H - 80), (i * 53) % (W - 80)
        masks[i, y0:y0 + 80, x0:x0 + 80] = True
    masks_d = jnp.asarray(masks)
    valid = jnp.ones(M, bool)

    def run():
        return np.asarray(emb.embed_masks(img, masks_d, valid))[0, 0]

    for mode in (os.environ.get("MODES") or "xla,fused").split(","):
        os.environ["OVO_FUSED_BLOCK"] = "1" if mode == "fused" else "0"
        _textregion_program.clear_cache()  # re-trace with the new dispatch
        run(); run()                        # compile + warm
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            out = emb.embed_masks(img, masks_d, valid)
        np.asarray(out)[0, 0]
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{mode:6s}: {dt:8.2f} ms/keyframe", flush=True)


if __name__ == "__main__":
    main()

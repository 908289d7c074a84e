#!/usr/bin/env python
"""A/B: two-keyframe NATIVE batching of the Hiera encoder (VERDICT r3 #8).

PERF.md 6f measured vmap micro-batching of the whole AMG as a loss (vmap
turns matmuls into batched dot_generals -- batch dim grows, M does not).
The remaining hypothesis: hiera_forward is natively batched, and its
window partition RESHAPES the batch into the window axis ((B*nW, ws, ws,
C) -> (-1, C) matmuls), so B=2 genuinely DOUBLES matmul M and doubles the
winfused attention instance count. This bench isolates the encoder:

  A: 4 sequential hiera_forward calls at B=1 (data-dependent chaining)
  B: 2 sequential calls at B=2 (same 4 keyframes)

Methodology per PERF.md: arguments not closures, one authoritative
np.asarray fetch, fetch-corrected timing, single TPU client.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

REPS = 6


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ovo_tpu.models.sam.hiera import HIERA_CONFIGS, hiera_forward, \
        init_hiera

    enc = os.environ.get("OVO_BENCH_SAM", "hiera_l")
    cfg = HIERA_CONFIGS[enc]
    params = init_hiera(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((4, 1024, 1024, 3)),
                       jnp.bfloat16)

    # one jitted program per batch size, dispatched from the host per
    # keyframe group -- EXACTLY the production call structure (the AMG
    # invokes hiera once per keyframe; fusing several forwards into one
    # jit changes XLA's layout/scheduling decisions and is not the
    # configuration we'd ship)
    def step_fn(params, x):
        return hiera_forward(params, cfg, x)[-1]

    # B=2 needs xla_tpu_scoped_vmem_limit_kib=20480: with the batch axis
    # reshaped into the window axis the winfused custom calls keep their
    # exact B=1 block shapes (wb=104 at (64,64,72)), but XLA's in-context
    # scoped-vmem accounting rejects them at the doubled instance counts
    # (18.05M > 16M default limit) even though each call compiles clean
    # standalone -- the arena is shared with co-scheduled fusions whose
    # tiles grow with B. Raised for BOTH legs so the comparison is flat.
    opts = {"xla_tpu_scoped_vmem_limit_kib": 20480}

    for name, bsz in (("B=1 x4", 1), ("B=2 x2", 2)):
        step = (jax.jit(step_fn)
                .lower(params, imgs[:bsz])
                .compile(compiler_options=opts))
        chunks = [imgs[i:i + bsz] for i in range(0, 4, bsz)]
        outs = [step(params, c) for c in chunks]
        np.asarray(outs[-1][0, 0, 0, 0])     # compile + warm
        t0 = time.time()
        for _ in range(REPS):
            for c in chunks:
                out = step(params, c)
            np.asarray(out[0, 0, 0, 0])
        dt = (time.time() - t0) / REPS
        print(f"{name}: {dt * 1e3:.1f} ms per 4 keyframes "
              f"({dt / 4 * 1e3:.2f} ms/keyframe)")


if __name__ == "__main__":
    main()

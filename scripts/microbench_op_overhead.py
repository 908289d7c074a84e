#!/usr/bin/env python
"""Measure per-op fixed overhead on the attached TPU.

One jitted program = a chain of N dependent matmuls (XLA cannot fuse
matmuls together, so the program has ~N executed ops). Sweeping N at a
fixed tiny matmul size separates per-op overhead from compute:

    t(N) ~= t0 + N * (roofline + overhead)

Run:  python scripts/microbench_op_overhead.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovo_jax_cache")

    d = 256      # 256x256 bf16 matmul: ~34 us roofline? no -- 2*256^3 =
    #             33 MFLOP -> ~0.2 us at peak; pure overhead probe
    w = jnp.asarray(np.random.default_rng(0).standard_normal((d, d)),
                    jnp.bfloat16) * 0.01

    results = {}
    for n_ops in (8, 32, 128, 512):
        def chain(x, w, n=n_ops):
            for _ in range(n):
                x = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
            return x

        f = jax.jit(chain, static_argnames=())
        x = jnp.asarray(np.random.default_rng(1).standard_normal((d, d)),
                        jnp.bfloat16)
        np.asarray(f(x, w))[0, 0]  # compile + sync
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(x, w)
        np.asarray(out)[0, 0]
        dt = (time.perf_counter() - t0) / reps * 1e3
        results[n_ops] = dt
        print(f"N={n_ops:4d} ops: {dt:8.3f} ms/call "
              f"({dt / n_ops * 1e3:7.2f} us/op)", flush=True)

    ns = sorted(results)
    per_op = (results[ns[-1]] - results[ns[0]]) / (ns[-1] - ns[0]) * 1e3
    print(f"\nmarginal per-op cost: {per_op:.2f} us "
          f"(256x256 bf16 matmul roofline ~0.2 us)")


if __name__ == "__main__":
    main()

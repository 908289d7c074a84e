#!/usr/bin/env python
"""Block-size sweep for the streaming flash kernel at the Hiera global
shape (8, 4096, 72 -> d padded to 128). The production dispatch uses
bq=bk=256 (PERF.md 6g: 1.07 ms vs 4.1 ms XLA); each global block costs
~1.1 ms in-program, 3 blocks per keyframe. Marginal-cost methodology of
scripts/microbench_fused_attention.py (chained dependent calls)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

CHAIN = 16


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovo_jax_cache")
    from ovo_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    b, h, l, d = 1, 8, 4096, 72
    d_pad = 128
    q = jnp.asarray(rng.standard_normal((b, h, l, d_pad)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, l, d_pad)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, l, d_pad)), jnp.bfloat16)
    # zero the pad lanes like the dispatcher does
    q = q.at[..., d:].set(0)
    k = k.at[..., d:].set(0)

    def chain(bq, bk):
        def run(q, k, v):
            def body(_, qq):
                o = A.flash_attention(qq, k, v, scale=d ** -0.5,
                                      block_q=bq, block_k=bk)
                return o.astype(qq.dtype)
            return jax.lax.fori_loop(0, CHAIN, body, q)
        return jax.jit(run)

    def time_fn(fn, iters=10):
        out = fn(q, k, v)
        np.asarray(out.ravel()[:1])
        t0 = time.time()
        for _ in range(iters):
            out = fn(q, k, v)
            np.asarray(out.ravel()[:1])
        return (time.time() - t0) / iters / CHAIN

    for bq in (256, 512, 1024):
        for bk in (256, 512, 1024, 2048, 4096):
            fb = A.flash_vmem_bytes(bq, bk, l, d_pad, 2)
            if fb > A._VMEM_BUDGET:
                print(f"bq={bq:5d} bk={bk:5d}: skip (VMEM {fb >> 20} MB)")
                continue
            t = time_fn(chain(bq, bk))
            print(f"bq={bq:5d} bk={bk:5d}: {t * 1e3:.3f} ms "
                  f"(VMEM {fb >> 20} MB)")

    # XLA reference
    def xla_run(q, k, v):
        def body(_, qq):
            o = A.xla_attention(qq, k, v, scale=d ** -0.5)
            return o.astype(qq.dtype)
        return jax.lax.fori_loop(0, CHAIN, body, q)

    t = time_fn(jax.jit(xla_run))
    print(f"XLA (d=128 padded): {t * 1e3:.3f} ms")


if __name__ == "__main__":
    main()

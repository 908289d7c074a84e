#!/usr/bin/env python
"""Microbenchmark: single-KV-block fused attention vs XLA at the hot-path
shapes (PE tower, Hiera window stages).

Marginal-cost methodology (PERF.md 6h): time a jitted chain of N dependent
attention calls vs a chain of 1; the slope isolates per-op device time from
the ~1.3 ms dispatch/fetch overhead of the axon tunnel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

CHAIN = 24


def main():
    import jax
    import jax.numpy as jnp

    from ovo_tpu.ops import attention as A

    rng = np.random.default_rng(0)

    def make_chain(attn, n):
        def run(q, k, v):
            def body(_, qq):
                o = attn(qq, k, v)
                return o.astype(qq.dtype)
            return jax.lax.fori_loop(0, n, body, q)
        return jax.jit(run)

    def time_fn(fn, args, iters=12):
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out.ravel()[:1])
        return (time.time() - t0) / iters

    shapes = [
        ("PE tower (TextRegion crops)", (7, 16, 577, 64)),
        ("Hiera s3 window", (25, 8, 196, 72)),
        ("Hiera s4 window", (25, 16, 49, 72)),
        ("Hiera s1 window", (1024, 2, 64, 72)),
        ("Hiera s2 window", (1024, 4, 16, 72)),
    ]

    for name, (b, h, l, d) in shapes:
        q = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, l, d)), jnp.bfloat16)

        def xla(q, k, v):
            return A.xla_attention(q, k, v)

        def fused(q, k, v, _l=l, _d=d):
            lq_pad = (-_l) % 8
            lk_pad = (-_l) % 128
            d_pad = (-_d) % 128
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, d_pad)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, d_pad)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, d_pad)))
            o = A.fused_attention(qp, kp, vp, scale=_d ** -0.5,
                                  kv_len=_l if lk_pad else None)
            return o[..., :_l, :_d]

        def fused_nodpad(q, k, v, _l=l, _d=d):
            lq_pad = (-_l) % 8
            lk_pad = (-_l) % 128
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
            o = A.fused_attention(qp, kp, vp, scale=_d ** -0.5,
                                  kv_len=_l if lk_pad else None)
            return o[..., :_l, :]

        row = [f"{name:30s} {str((b, h, l, d)):20s}"]
        for label, impl in (("xla", xla), ("fused", fused),
                            ("fused-nodpad", fused_nodpad)):
            t1 = time_fn(make_chain(impl, 1), (q, k, v))
            tn = time_fn(make_chain(impl, CHAIN), (q, k, v))
            per_op = (tn - t1) / (CHAIN - 1)
            row.append(f"{label} {per_op*1e3:7.3f} ms/op")
        # correctness
        ox = np.asarray(jax.jit(xla)(q, k, v), np.float32)
        of = np.asarray(jax.jit(fused)(q, k, v), np.float32)
        row.append(f"maxerr {np.max(np.abs(ox - of)):.2e}")
        print("   ".join(row))
        sys.stdout.flush()


if __name__ == "__main__":
    main()

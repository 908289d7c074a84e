"""Single-pass row LayerNorm Pallas kernel — tested utility, NOT wired
into the production towers.

Hypothesis was that XLA's separate reduce fusion + apply fusion for
``mean/var over the minor axis -> normalize`` leaves bandwidth on the
table (a trace read 0.38 ms for the 8.3 MB (7, 577, 1024) bf16 PE-tower
tensor). Measured on-chip with dispatch overhead amortized (chained-LN
fori_loop), the kernel is dead even with the XLA path at every
production shape — (7,577,1024) 0.47 vs 0.48 ms, (256k,256) 1.30 vs
1.29 ms, (8,4096,1152) 0.63 vs 0.58 ms — the apparent 20x gap was
per-dispatch latency, not the fusion (PERF.md 6q). Kept like
ops/mask_tail.py / ops/fused_block.py: a correct, unit-tested kernel
(same f32-statistics numerics as models.layers.layer_norm up to f32
associativity) available for future fusion work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

_VMEM_BUDGET = 12 * 1024 * 1024


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)                 # (R, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    cen = x - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    y = cen * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def ln_vmem_bytes(rb: int, c: int, itemsize: int) -> int:
    """Double-buffered in/out blocks + the f32 working copy."""
    return 2 * itemsize * (2 * rb * c) + 4 * rb * c


def _row_block(rows: int, c: int, itemsize: int) -> int | None:
    for rb in (1024, 512, 256, 128, 64, 32, 16, 8):
        if ln_vmem_bytes(rb, c, itemsize) <= _VMEM_BUDGET:
            return rb
    return None


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_call(x2, scale, bias, *, eps, interpret=False):
    rows, c = x2.shape
    rb = _row_block(rows, c, x2.dtype.itemsize)
    pad = (-rows) % rb
    if pad:
        # padded rows normalize zeros -> bias; sliced off below
        x2 = jnp.concatenate(
            [x2, jnp.zeros((pad, c), x2.dtype)], axis=0)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=((rows + pad) // rb,),
        in_specs=[pl.BlockSpec((rb, c), lambda i: (i, 0)),
                  pl.BlockSpec((c,), lambda i: (0,)),
                  pl.BlockSpec((c,), lambda i: (0,))],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows + pad, c), x2.dtype),
        interpret=interpret,
    )(x2, scale, bias)
    return out[:rows] if pad else out


def fits(rows: int, c: int, itemsize: int) -> bool:
    """Shape gate: a row block must exist, the feature axis must be
    lane-tileable, and the tensor must be big enough to beat dispatch
    overhead (~0.05 ms)."""
    return (c % 128 == 0 and rows >= 1024
            and _row_block(rows, c, itemsize) is not None)


def layer_norm_rows(x: Array, scale: Array, bias: Array,
                    eps: float = 1e-5) -> Array:
    """LayerNorm over the minor axis of ``x`` (any leading shape),
    single-pass Pallas kernel. Caller gates with ``fits``."""
    c = x.shape[-1]
    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    out = _ln_call(x.reshape(rows, c), scale, bias, eps=eps)
    return out.reshape(lead + (c,))

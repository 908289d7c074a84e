"""Row LayerNorm Pallas kernels.

``layer_norm_rows`` (plain LN) is a tested utility, NOT wired into the
production towers: measured dead even with XLA at every tower shape once
dispatch overhead was amortized (PERF.md 6q) — those tensors are small.

``residual_layer_norm`` (x + residual -> LN, one pass) IS production for
the SAM decoder's image-side norm4: at (256, 4096, 256) bf16 (537 MB)
XLA runs a separate residual-add fusion plus a THREE-read LN (mean
fusion, var fusion, normalize fusion — traced 0.72 + 0.71 + 1.63 ms,
~3.8 GB of HBM for what is one read + one write of each operand). The
kernel reads attn_out and keys once (keys may be batch-1: the broadcast
never materializes), computes f32 statistics in VMEM, writes once —
and the keys residual stream is the AMG roofline's biggest HBM item.
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


# ---------------------------------------------------------------------------
# Fused residual-add + LayerNorm (production: SAM decoder norm4)
# ---------------------------------------------------------------------------

def _res_ln_kernel(x_ref, r_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32) + r_ref[0].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    cen = x - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    y = cen * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def res_ln_vmem_bytes(rb: int, c: int, itemsize: int) -> int:
    """Double-buffered x/res/out blocks + the f32 working copy."""
    return 2 * itemsize * (3 * rb * c) + 4 * rb * c


def _res_ln_row_block(l: int, c: int, itemsize: int) -> int | None:
    for rb in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if l % rb == 0 and res_ln_vmem_bytes(rb, c, itemsize) <= _VMEM_BUDGET:
            return rb
    return None


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _res_ln_call(x, res, scale, bias, *, eps, interpret=False):
    B, L, C = x.shape
    Br = res.shape[0]
    rb = _res_ln_row_block(L, C, x.dtype.itemsize)
    rmap = (lambda i, j: (i, j, 0)) if Br > 1 else (lambda i, j: (0, j, 0))
    return pl.pallas_call(
        functools.partial(_res_ln_kernel, eps=eps),
        grid=(B, L // rb),
        in_specs=[pl.BlockSpec((1, rb, C), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, rb, C), rmap),
                  pl.BlockSpec((C,), lambda i, j: (0,)),
                  pl.BlockSpec((C,), lambda i, j: (0,))],
        out_specs=pl.BlockSpec((1, rb, C), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        interpret=interpret,
    )(x, res, scale, bias)


def res_ln_fits(b: int, l: int, c: int, itemsize: int) -> bool:
    """Gate: lane-tileable feature axis, a whole number of row blocks, and
    big enough that one kernel dispatch beats three XLA fusion passes."""
    return (c % 128 == 0 and b * l >= 65536
            and _res_ln_row_block(l, c, itemsize) is not None)


def residual_layer_norm(x: Array, res: Array, scale: Array, bias: Array,
                        eps: float = 1e-5) -> Array:
    """LayerNorm(x + res) over the minor axis in ONE HBM pass.

    x: (B, L, C); res: (B, L, C) or (1, L, C) — a batch-1 residual is
    shared across the grid without materializing the broadcast. Caller
    gates with ``res_ln_fits`` (and handles the XLA fallback)."""
    return _res_ln_call(x, res, scale, bias, eps=eps)

"""Fused attention for the ViT/Hiera towers.

Two implementations behind one call:
  - ``flash``: a Pallas TPU kernel (blocked K/V streaming with running
    softmax, bf16 matmuls on the MXU, f32 accumulators). Forward-only: every
    tower in this framework runs inference in the mapping hot loop.
  - ``xla``: plain einsum+softmax, used on CPU (tests) and for shapes the
    kernel does not cover.

`dot_product_attention(q, k, v)` picks automatically.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def xla_attention(q: Array, k: Array, v: Array,
                  mask: Optional[Array] = None, scale: Optional[float] = None
                  ) -> Array:
    """(B, H, Lq, D), (B, H, Lk, D) -> (B, H, Lq, D). mask broadcastable to
    (B, H, Lq, Lk), True = attend."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float,
                  causal: bool, kv_len: int):
    q = q_ref[0].astype(jnp.float32) * scale          # (block_q, d)
    block_q, d = q.shape
    lk = k_ref.shape[1]
    n_kb = lk // block_k
    q_block_start = pl.program_id(1) * block_q

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if causal or kv_len < lk:
            q_ids = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0) + q_block_start
            k_ids = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            ok = k_ids < kv_len
            if causal:
                ok &= q_ids >= k_ids
            s = jnp.where(ok, s, -1e30)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "causal", "block_q",
                                             "block_k", "kv_len",
                                             "interpret"))
def flash_attention(q: Array, k: Array, v: Array, *,
                    scale: Optional[float] = None, causal: bool = False,
                    block_q: int = 256, block_k: int = 256,
                    kv_len: Optional[int] = None,
                    interpret: bool = False) -> Array:
    """(B, H, L, D) fused attention. L must be padded to block multiples by
    the caller (wrapper below handles it). ``kv_len`` masks out padded key
    rows beyond that (static) length."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    bq = min(block_q, lq)
    bk = min(block_k, lk)
    assert lq % bq == 0 and lk % bk == 0

    qr = q.reshape(b * h, lq, d)
    kr = k.reshape(b * h, lk, d)
    vr = v.reshape(b * h, lk, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=bk, scale=scale,
                          causal=causal,
                          kv_len=lk if kv_len is None else kv_len),
        grid=(b * h, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(b, h, lq, d)


def _fused_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    """Whole-KV fused attention: K/V fully VMEM-resident, ONE qk matmul,
    plain (non-streaming) softmax in registers, one pv matmul. No fori_loop
    carries / running-max rescaling -- at the small sequence lengths of the
    PE tower (577) and Hiera windows (<=196) the streaming variant's loop
    overhead is what made it lose to XLA (PERF.md #3); here the f32
    (lq, lk) score tile never touches HBM."""
    q = q_ref[0]                                       # (bq, d) bf16
    k = k_ref[0]                                       # (lk, d)
    lk = k.shape[0]
    # bf16 MXU passes with f32 accumulation, scale applied in f32 AFTER the
    # dot -- the exact op order of xla_attention
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if kv_len < lk:
        k_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_ids < kv_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_len", "block_q",
                                             "interpret"))
def fused_attention(q: Array, k: Array, v: Array, *,
                    scale: Optional[float] = None,
                    kv_len: Optional[int] = None,
                    block_q: int = 1024,
                    interpret: bool = False) -> Array:
    """(B, H, L, D) single-KV-block attention. Caller pads lq/lk to multiples
    of 8/128 respectively; padded keys beyond ``kv_len`` are masked out,
    padded query rows produce garbage the caller slices off."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    bq = min(block_q, lq)
    assert lq % bq == 0

    qr = q.reshape(b * h, lq, d)
    kr = k.reshape(b * h, lk, d)
    vr = v.reshape(b * h, lk, d)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=scale,
                          kv_len=lk if kv_len is None else kv_len),
        grid=(b * h, lq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(b, h, lq, d)


def _winfused_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                     kv_len: int):
    """Batched whole-KV attention over a BLOCK of tiny instances (Hiera
    windows / decoder token self-attention): one batched qk dot -> plain
    softmax -> one batched pv dot, all in VMEM. The single-instance fused
    kernel loses at these shapes because b*h is in the thousands and each
    grid step carries ~0.58 us of fixed overhead (PERF.md 6k); here one
    grid step covers window_block instances."""
    q = q_ref[...]                                     # (WB, lq, d) bf16
    k = k_ref[...]                                     # (WB, lk, d)
    lk = k.shape[1]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if kv_len < lk:
        ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(ids < kv_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_len",
                                             "window_block", "interpret"))
def windowed_fused_attention(q: Array, k: Array, v: Array, *,
                             scale: Optional[float] = None,
                             kv_len: Optional[int] = None,
                             window_block: int = 128,
                             interpret: bool = False) -> Array:
    """(B, H, Lq, D) attention for many small instances. Caller pads Lq/Lk
    to multiples of 8 (padded keys masked via ``kv_len``, padded query rows
    are garbage to slice off); D must be a multiple of 8. B*H is padded to
    the window block internally (zero instances softmax to uniform -- no
    NaNs -- and are sliced off)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    bh = b * h
    # bound the f32 (WB, lq, lk) score tile to ~4 MB of VMEM
    wb = max(8, min(window_block, (1 << 20) // (lq * lk)))
    wb = min(wb, -(-bh // 8) * 8)
    pad = (-bh) % wb
    qr = q.reshape(bh, lq, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)
    if pad:
        qr = jnp.pad(qr, ((0, pad), (0, 0), (0, 0)))
        kr = jnp.pad(kr, ((0, pad), (0, 0), (0, 0)))
        vr = jnp.pad(vr, ((0, pad), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_winfused_kernel, scale=scale,
                          kv_len=lk if kv_len is None else kv_len),
        grid=((bh + pad) // wb,),
        in_specs=[
            pl.BlockSpec((wb, lq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((wb, lk, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((wb, lk, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((wb, lq, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh + pad, lq, d), q.dtype),
        interpret=interpret,
    )(qr, kr, vr)
    return out[:bh].reshape(b, h, lq, d)


def dot_product_attention(q: Array, k: Array, v: Array,
                          mask: Optional[Array] = None,
                          scale: Optional[float] = None,
                          causal: bool = False,
                          impl: str = "auto") -> Array:
    """Dispatcher. Uses the Pallas kernel on TPU for unmasked (or causal)
    attention with kernel-friendly shapes; XLA otherwise.
    ``OVO_NO_PALLAS=1`` forces the XLA path (TPU-worker fault isolation)."""
    import os

    if os.environ.get("OVO_NO_PALLAS") == "1" and impl == "auto":
        impl = "xla"
    if impl == "xla" or mask is not None or not _on_tpu():
        if causal and mask is None:
            lq, lk = q.shape[-2], k.shape[-2]
            mask = jnp.tril(jnp.ones((lq, lk), bool))[None, None]
        return xla_attention(q, k, v, mask=mask, scale=scale)

    lq, lk, d = q.shape[-2], k.shape[-2], q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    # Mid-size maskless self-attention (the PE/CLIP towers: L=577-730,
    # hd=64/72) routes through the single-KV-block fused kernel: XLA
    # materializes the f32 (L, L) probability tensor in HBM (149 MB/layer
    # for the 7-crop PE batch) while the kernel keeps the score tile in
    # VMEM -- measured 0.206 vs 0.486 ms/op at (7, 16, 577, 64)
    # (scripts/microbench_fused_attention.py, PERF.md 6k). The instance
    # grid must stay small: at Hiera's thousands of tiny windows the
    # per-instance grid overhead makes the kernel LOSE (1.2 ms vs 0.05 ms
    # at (1024, 2, 64, 72)), so window attention stays on XLA.
    bh = 1
    for s in q.shape[:-2]:
        bh *= s
    if (impl in ("auto", "fused") and not causal and mask is None
            and _on_tpu() and os.environ.get("OVO_NO_PALLAS") != "1"
            and lq == lk and 256 <= lk <= 1024 and bh <= 512
            and d <= 128 and d % 8 == 0):
        lq_pad = (-lq) % 8
        lk_pad = (-lk) % 128
        d_pad = (-d) % 128
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, d_pad)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, d_pad)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, d_pad)))
        o = fused_attention(qp, kp, vp, scale=scale,
                            kv_len=lk if lk_pad else None)
        return o[..., :lq, :d]
    # Small-instance attention (Hiera windows: L=16-200 at b*h up to 4096;
    # decoder token self-attention) routes through the BATCHED fused kernel:
    # one grid step covers a whole block of windows, so the per-instance
    # grid overhead that makes the single-KV kernel lose here is amortized
    # and the f32 score tiles never touch HBM (PERF.md 6m).
    if (impl in ("auto", "winfused") and not causal and mask is None
            and _on_tpu() and os.environ.get("OVO_NO_PALLAS") != "1"
            and lq <= 512 and lk <= 512 and d % 8 == 0 and d <= 128):
        lq_pad = (-lq) % 8
        lk_pad = (-lk) % 8
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, 0))) if lq_pad \
            else q
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, 0))) if lk_pad \
            else k
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, 0))) if lk_pad \
            else v
        o = windowed_fused_attention(qp, kp, vp, scale=scale,
                                     kv_len=lk if lk_pad else None)
        return o[..., :lq, :d] if lq_pad else o
    # The streaming kernel handles any head dim that is a multiple of 8
    # (ragged KV via kv_len), but traced end-to-end XLA's fused attention
    # is FASTER for the small-head-dim towers here (Hiera hd=72 routed
    # through the unpadded d=72 kernel: AMG 90->101 ms), so "auto" routes
    # (a) MXU-native head dims and (b) LARGE sequences, where XLA
    # materializes the f32 (L, L) probability tensor in HBM (537 MB at
    # L=4096) and the kernel's streaming softmax wins even with the head
    # dim zero-padded to 128: Hiera-global (8, 4096, 72) measured 4.1 ms
    # XLA vs 1.1 ms padded kernel (PERF.md 6g). Zero-padded q/k leave the
    # scores unchanged; padded v columns are sliced off. Callers can force
    # the streaming kernel with impl="flash".
    big = lq >= 2048 and lk >= 2048
    if impl != "flash" and not big and (d % 128 != 0 or lq < 128 or lk < 128):
        if causal:
            mask = jnp.tril(jnp.ones((lq, lk), bool))[None, None]
        return xla_attention(q, k, v, mask=mask, scale=scale)
    if big and d % 128 != 0:
        pad_d = (-d) % 128
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad_d)))

    # pad sequence lengths to block multiples; padded keys are masked out
    # inside the kernel (kv_len), padded query rows are sliced off
    bq = 128 if lq % 256 else 256
    bk = 128 if lk % 256 else 256
    pad_q = (-lq) % bq
    pad_k = (-lk) % bk
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    out = flash_attention(q, k, v, scale=scale, causal=causal,
                          block_q=bq, block_k=bk,
                          kv_len=lk if pad_k else None)
    return out[..., :lq, :d]

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


# ---------------------------------------------------------------------------
# VMEM footprint model
# ---------------------------------------------------------------------------
# Mosaic kernels run out of a ~16 MB scoped-VMEM arena per core. A kernel's
# per-grid-step footprint is (a) its in/out blocks, DOUBLE-buffered by the
# automatic pipeline, plus (b) every intermediate the kernel body
# materializes (here: the f32 score tile, its f32 exp, and the cast-back
# probability tile). Round 2 budgeted only the score tile and the winfused
# kernel blew the arena on the real chip at Hiera window shapes
# (18.29M > 16M, BENCH_r02.json); every block choice below now comes from
# the full model, with ~25% headroom for Mosaic's own temporaries.

_SCOPED_VMEM_BYTES = 16 * 1024 * 1024
_VMEM_BUDGET = 12 * 1024 * 1024


def winfused_vmem_bytes(wb: int, lq: int, lk: int, d: int,
                        itemsize: int) -> int:
    """Per-grid-step footprint of the batched window kernel: double-buffered
    q/out (wb,lq,d) + k/v (wb,lk,d) blocks, plus the (wb,lq,lk) score tile
    in f32, its exp in f32, and the probability tile cast to the v dtype."""
    io = 2 * itemsize * 2 * wb * d * (lq + lk)
    inter = wb * lq * lk * (4 + 4 + itemsize)
    return io + inter


def winfused_window_block(lq: int, lk: int, d: int, itemsize: int,
                          max_block: int = 128) -> Optional[int]:
    """Largest window block (multiple of 8, <= max_block) whose footprint
    fits the VMEM budget; None if even 8 does not fit -> caller must use
    XLA."""
    per_instance = winfused_vmem_bytes(1, lq, lk, d, itemsize)
    wb = (_VMEM_BUDGET // per_instance) // 8 * 8
    if wb < 8:
        return None
    return min(wb, max_block)


def fused_vmem_bytes(bq: int, lk: int, d: int, itemsize: int) -> int:
    """Per-grid-step footprint of the single-KV-block kernel. Lane (minor)
    dims round up to the physical 128-lane tile: operands pad ``d``,
    the f32 score/exp intermediates pad ``lk``."""
    d_ln = -(-d // 128) * 128
    lk_ln = -(-lk // 128) * 128
    io = 2 * itemsize * d_ln * (2 * bq + 2 * lk)
    inter = bq * lk_ln * (4 + 4 + itemsize)
    return io + inter


def flash_vmem_bytes(bq: int, bk: int, lk: int, d: int,
                     itemsize: int) -> int:
    """Per-grid-step footprint of the streaming kernel: double-buffered q/out
    blocks and FULL k/v rows (BlockSpec (1, lk, d)), plus the f32 running
    accumulator and per-block score/exp tiles."""
    io = 2 * itemsize * d * (2 * bq + 2 * lk)
    acc = bq * d * 4
    inter = bq * bk * (4 + 4 + itemsize)
    return io + acc + inter


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


def _rope_packed_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *,
                        scale: float, kv_len: int, hd: int):
    """One (batch, head-group) instance of packed-qkv RoPE attention: the
    q/k/v head blocks stream straight out of the (B, L, 3D) qkv-projection
    tensor, RoPE rotates q/k on the VMEM tiles, and the output block lands
    in (B, L, D) token-major layout ready for the out-projection. Nothing
    between the qkv matmul and the out matmul touches HBM in a non-native
    layout -- this deletes the head-split transposes, the rope
    materialization, and the per-tensor pads that cost ~4.5 ms/keyframe
    around the PE tower's attention (ROOFLINE r5 trace).

    Blocks are 128 lanes wide (the Mosaic block-shape granule), so one
    grid step processes 128/hd heads side by side, statically unrolled."""
    q = q_ref[0]                                       # (L8, 128) bf16
    k = k_ref[0]
    c = cos_ref[...].astype(q.dtype)                   # (L8, hd/2)
    s = sin_ref[...].astype(q.dtype)
    hd2 = hd // 2
    hpb = q.shape[-1] // hd

    def rot(x):
        x1, x2 = x[:, :hd2], x[:, hd2:]
        # same op order/dtype as layers.apply_rope (bf16 mults)
        return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)

    outs = []
    for t in range(hpb):
        qt = rot(q[:, t * hd:(t + 1) * hd])
        kt = rot(k[:, t * hd:(t + 1) * hd])
        sc = jax.lax.dot_general(qt, kt, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        lk = kt.shape[0]
        if kv_len < lk:
            ids = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
            sc = jnp.where(ids < kv_len, sc, -1e30)
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
        outs.append(jax.lax.dot_general(
            p, v_ref[0][:, t * hd:(t + 1) * hd], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype))
    o_ref[0] = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)


def rope_packed_vmem_bytes(l8: int, hd: int, itemsize: int) -> int:
    """Per-grid-step footprint of the packed-RoPE kernel: 128-lane blocks
    (= 128/hd heads per step), lane dims round to the physical 128."""
    def lane(d):
        return -(-d // 128) * 128

    hpb = max(128 // hd, 1)
    io = 2 * itemsize * l8 * 128 * 4             # q/k/v/out double-buffered
    tabs = 2 * 2 * 4 * l8 * lane(hd // 2)        # cos/sin f32
    rot = 2 * l8 * lane(hd) * itemsize * hpb     # rotated q/k tiles
    inter = hpb * l8 * lane(l8) * (4 + 4 + itemsize)  # scores, exp, p cast
    return io + tabs + rot + inter


def use_rope_packed(bh: int, l: int, hd: int, heads: int,
                    itemsize: int) -> bool:
    """Dispatch predicate for rope_packed_attention (mirrors the 'fused'
    route's shape envelope; OVO_NO_PALLAS and CPU fall back)."""
    import os

    if os.environ.get("OVO_NO_PALLAS") == "1" or not _on_tpu():
        return False
    if hd > 128 or 128 % max(hd, 1) or hd % 2 or heads % (128 // hd):
        return False
    l8 = -(-l // 8) * 8
    return (256 <= l <= 1024 and bh <= 512
            and rope_packed_vmem_bytes(l8, hd, itemsize) <= _VMEM_BUDGET)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "kv_len",
                                             "interpret"))
def rope_packed_attention(qkv: Array, cos: Array, sin: Array, *, heads: int,
                          scale: Optional[float] = None,
                          kv_len: Optional[int] = None,
                          interpret: bool = False) -> Array:
    """(B, L, 3D) packed qkv projection + (L, hd/2) RoPE tables ->
    (B, L, D) attention output in token-major layout (see
    _rope_packed_kernel). Pads L to a sublane multiple internally; padded
    keys are masked, padded query rows are sliced off. A caller that
    pre-pads the token stream ONCE for the whole tower passes ``kv_len`` =
    the real token count instead (vit.forward_features) -- that deletes
    the per-layer qkv pad (24 x 0.035 ms at the PE shape)."""
    B, L, three_d = qkv.shape
    D = three_d // 3
    hd = D // heads
    hpb = 128 // hd                      # heads per 128-lane block
    assert hpb >= 1 and heads % hpb == 0 and D % 128 == 0
    scale = scale if scale is not None else hd ** -0.5
    pad = (-L) % 8
    if pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, pad), (0, 0)))
        cos = jnp.pad(cos, ((0, pad), (0, 0)))
        sin = jnp.pad(sin, ((0, pad), (0, 0)))
    l8 = L + pad
    kv = kv_len if kv_len is not None else (L if pad else l8)
    nb = D // 128                        # 128-lane blocks per q/k/v section
    out = pl.pallas_call(
        functools.partial(_rope_packed_kernel, scale=scale,
                          kv_len=kv, hd=hd),
        grid=(B, heads // hpb),
        in_specs=[
            pl.BlockSpec((1, l8, 128), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, l8, 128), lambda b, j: (b, 0, nb + j)),
            pl.BlockSpec((1, l8, 128), lambda b, j: (b, 0, 2 * nb + j)),
            pl.BlockSpec((l8, cos.shape[-1]), lambda b, j: (0, 0)),
            pl.BlockSpec((l8, sin.shape[-1]), lambda b, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l8, 128), lambda b, j: (b, 0, j)),
        out_shape=jax.ShapeDtypeStruct((B, l8, D), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, cos, sin)
    return out[:, :L, :] if pad else out


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
    # block choice from the full VMEM footprint model (blocks x double
    # buffering + f32 score/exp tiles) -- NOT just the score tile
    wb = winfused_window_block(lq, lk, d, q.dtype.itemsize,
                               max_block=window_block)
    if wb is None:
        raise ValueError(
            f"windowed_fused_attention: no window block fits scoped VMEM at "
            f"(lq={lq}, lk={lk}, d={d}); route this shape through XLA")
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


def _packed_heads_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                         scale: float, kv_len: int):
    """Batched multi-head attention over a block of window instances with
    the heads SLICED IN-KERNEL from the (wb, l, dout) head-packed layout
    (dout = heads * hd, straight from the qkv projection slices). Replaces
    the winfused route's (B, L, H, hd) -> (B, H, L, hd) transposes, which
    cost ~3 ms/keyframe of layout-flip copies around the Hiera window
    attention (ROOFLINE r5 trace)."""
    q = q_ref[...]                                     # (wb, lq, dout)
    k = k_ref[...]
    v = v_ref[...]
    dout = q.shape[-1]
    hd = dout // heads
    lk = k.shape[1]
    outs = []
    for h in range(heads):
        qh = q[:, :, h * hd:(h + 1) * hd]
        kh = k[:, :, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        if kv_len < lk:
            ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(ids < kv_len, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, v[:, :, h * hd:(h + 1) * hd], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype))
    o_ref[...] = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)


def packed_heads_vmem_bytes(wb: int, lq: int, lk: int, dout: int,
                            itemsize: int) -> int:
    """Per-grid-step footprint of the head-packed window kernel (lane dims
    round to 128; per-head intermediates budgeted x2 for liveness across
    the unrolled head loop)."""
    def lane(d):
        return -(-d // 128) * 128

    io = 2 * itemsize * wb * lane(dout) * (2 * lq + 2 * lk)
    inter = 2 * wb * lq * lane(lk) * (4 + 4 + itemsize)
    return io + inter


def packed_heads_block(lq: int, lk: int, dout: int, itemsize: int,
                       max_block: int = 128) -> Optional[int]:
    """Largest window block (multiple of 8) that fits the VMEM budget;
    None -> caller falls back to the transpose + winfused path."""
    per = packed_heads_vmem_bytes(1, lq, lk, dout, itemsize)
    wb = (_VMEM_BUDGET // per) // 8 * 8
    if wb < 8:
        return None
    return min(wb, max_block)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def packed_heads_attention(q: Array, k: Array, v: Array, *, heads: int,
                           scale: Optional[float] = None,
                           interpret: bool = False) -> Array:
    """(B, Lq, dout) x (B, Lk, dout) head-packed attention -> (B, Lq, dout)
    (see _packed_heads_kernel). Pads Lq/Lk to sublane multiples (padded
    keys masked, padded query rows garbage to slice) and B to the window
    block (zero instances softmax to uniform -- no NaNs)."""
    B, lq, dout = q.shape
    lk = k.shape[1]
    hd = dout // heads
    scale = scale if scale is not None else hd ** -0.5
    lqp = (-lq) % 8
    lkp = (-lk) % 8
    if lqp:
        q = jnp.pad(q, ((0, 0), (0, lqp), (0, 0)))
    if lkp:
        k = jnp.pad(k, ((0, 0), (0, lkp), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lkp), (0, 0)))
    wb = packed_heads_block(lq + lqp, lk + lkp, dout, q.dtype.itemsize)
    assert wb is not None, "caller must gate on packed_heads_block"
    wb = min(wb, -(-B // 8) * 8)
    bp = (-B) % wb
    if bp:
        q = jnp.pad(q, ((0, bp), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, bp), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, bp), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_packed_heads_kernel, heads=heads, scale=scale,
                          kv_len=lk),
        grid=((B + bp) // wb,),
        in_specs=[
            pl.BlockSpec((wb, lq + lqp, dout), lambda i: (i, 0, 0)),
            pl.BlockSpec((wb, lk + lkp, dout), lambda i: (i, 0, 0)),
            pl.BlockSpec((wb, lk + lkp, dout), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((wb, lq + lqp, dout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B + bp, lq + lqp, dout), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:B, :lq]


def use_packed_heads(lq: int, lk: int, dout: int, heads: int,
                     itemsize: int) -> bool:
    """Dispatch predicate for packed_heads_attention."""
    import os

    if os.environ.get("OVO_NO_PALLAS") == "1" or not _on_tpu():
        return False
    if dout % heads or (dout // heads) % 8 or lq > 512 or lk > 512:
        return False
    lq8 = -(-lq // 8) * 8
    lk8 = -(-lk // 8) * 8
    return packed_heads_block(lq8, lk8, dout, itemsize) is not None


def select_attention_route(bh: int, lq: int, lk: int, d: int, itemsize: int,
                           *, causal: bool = False, has_mask: bool = False,
                           on_tpu: bool = True, no_pallas: bool = False,
                           impl: str = "auto") -> str:
    """Pure routing decision for ``dot_product_attention``: which
    implementation runs a (bh, lq, lk, d) attention with the given element
    size. Returns "xla" | "fused" | "winfused" | "flash". Every non-XLA
    route is guaranteed by construction to fit the scoped-VMEM budget
    (the round-2 bench crash was a dispatch that skipped this check,
    BENCH_r02.json) -- tests walk every model shape through this function.

    Routing rationale (measurements in PERF.md 6g/6k/6m):
      - mid-size maskless self-attention (PE/CLIP towers, L=577-730) ->
        "fused": XLA materializes the f32 (L, L) probability tensor in HBM
        (149 MB/layer for the 7-crop PE batch) while the kernel keeps it in
        VMEM -- 0.206 vs 0.486 ms/op at (7, 16, 577, 64);
      - many tiny instances (Hiera windows L=16-200 at b*h up to 4096,
        decoder token self-attention) -> "winfused": one grid step covers a
        whole block of windows, amortizing the per-instance grid overhead
        that makes the single-KV kernel lose here (1.2 ms vs 0.05 ms at
        (1024, 2, 64, 72));
      - LARGE sequences (Hiera global attention, L>=2048) -> "flash"
        streaming softmax: 1.1 ms vs XLA 4.1 ms at (8, 4096, 72) even with
        the head dim zero-padded to 128;
      - everything else -> "xla" (traced end-to-end XLA fused attention wins
        at small-head-dim mid-size shapes: AMG 90->101 ms when forced
        through the kernel).
    """
    if impl == "xla" or no_pallas or has_mask or not on_tpu:
        return "xla"
    if (impl in ("auto", "fused") and not causal
            and lq == lk and 256 <= lk <= 1024 and bh <= 512
            and d <= 128 and d % 8 == 0
            and fused_vmem_bytes(-(-lq // 8) * 8, -(-lk // 8) * 8,
                                 d, itemsize) <= _VMEM_BUDGET):
        return "fused"
    if (impl in ("auto", "winfused") and not causal
            and lq <= 512 and lk <= 512 and d % 8 == 0 and d <= 128
            and winfused_window_block(-(-lq // 8) * 8, -(-lk // 8) * 8, d,
                                      itemsize) is not None):
        return "winfused"
    big = lq >= 2048 and lk >= 2048
    if impl != "flash" and not big and (d % 128 != 0 or lq < 128 or lk < 128):
        return "xla"
    d_pad = -(-d // 128) * 128 if big else d
    if d_pad % 128 != 0:
        return "xla"
    bq, bk, lk_pad = flash_blocks(lq, lk, d_pad, itemsize)
    # the streaming kernel keeps the FULL (double-buffered) K/V rows in
    # VMEM; at very long sequences that alone can blow the scoped arena
    if flash_vmem_bytes(bq, bk, lk_pad, d_pad, itemsize) > _VMEM_BUDGET:
        return "xla"
    return "flash"


def flash_blocks(lq: int, lk: int, d_pad: int, itemsize: int
                 ) -> tuple:
    """(block_q, block_k, lk_pad) for the streaming kernel. Larger K
    blocks amortize the fori_loop carry rescaling: at the Hiera global
    shape (8, 4096, 128-padded) bk=1024 measured 2.13 ms vs 2.80 ms at
    bk=256 (scripts/microbench_flash_blocks.py, chained marginal cost) --
    pick the largest bk that divides lk evenly and fits VMEM, falling
    back to the pad-minimizing small blocks."""
    bq = 128 if lq % 256 else 256
    for bk in (1024, 512, 256, 128):
        if lk % bk == 0 and flash_vmem_bytes(
                bq, bk, lk, d_pad, itemsize) <= _VMEM_BUDGET:
            return bq, bk, lk
    bk = 128 if lk % 256 else 256
    return bq, bk, -(-lk // bk) * bk


def dot_product_attention(q: Array, k: Array, v: Array,
                          mask: Optional[Array] = None,
                          scale: Optional[float] = None,
                          causal: bool = False,
                          impl: str = "auto") -> Array:
    """Dispatcher. Uses a Pallas kernel on TPU for unmasked (or causal)
    attention with kernel-friendly shapes; XLA otherwise. Route choice and
    the VMEM-fit guarantees live in ``select_attention_route``.
    ``OVO_NO_PALLAS=1`` forces the XLA path (TPU-worker fault isolation)."""
    import os

    lq, lk, d = q.shape[-2], k.shape[-2], q.shape[-1]
    bh = 1
    for s in q.shape[:-2]:
        bh *= s
    route = select_attention_route(
        bh, lq, lk, d, q.dtype.itemsize, causal=causal,
        has_mask=mask is not None, on_tpu=_on_tpu(),
        no_pallas=os.environ.get("OVO_NO_PALLAS") == "1", impl=impl)

    if route == "xla":
        if causal and mask is None:
            mask = jnp.tril(jnp.ones((lq, lk), bool))[None, None]
        return xla_attention(q, k, v, mask=mask, scale=scale)

    scale = scale if scale is not None else d ** -0.5
    if route == "fused":
        # pad lq/lk to sublane multiples (8) ONLY -- like winfused, the
        # kernel takes the head dim (64/72/...) and a non-%128 key length
        # natively (Mosaic masks the lane remainder). The old %128 pads on
        # lk AND d doubled q/k/v HBM traffic and ran the MXU on zeros:
        # 2.0 ms of pad materialization + ~40% kernel time at the PE
        # tower's (7, 16, 577, 64) (ROOFLINE r5 trace).
        lq_pad = (-lq) % 8
        lk_pad = (-lk) % 8
        qp = (jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, 0)))
              if lq_pad else q)
        kp = (jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
              if lk_pad else k)
        vp = (jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, 0)))
              if lk_pad else v)
        o = fused_attention(qp, kp, vp, scale=scale,
                            kv_len=lk if lk_pad else None)
        return o[..., :lq, :] if lq_pad else o

    if route == "winfused":
        lq_pad = (-lq) % 8
        lk_pad = (-lk) % 8
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad), (0, 0))) \
            if lq_pad else q
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad), (0, 0))) \
            if lk_pad else k
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad), (0, 0))) \
            if lk_pad else v
        o = windowed_fused_attention(qp, kp, vp, scale=scale,
                                     kv_len=lk if lk_pad else None)
        return o[..., :lq, :d] if lq_pad else o

    # route == "flash": zero-padded q/k leave the scores unchanged; padded
    # v columns and query rows are sliced off; padded keys masked (kv_len)
    if d % 128 != 0:
        pad_d = (-d) % 128
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
    bq, bk, _ = flash_blocks(lq, lk, q.shape[-1], q.dtype.itemsize)
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


# ---------------------------------------------------------------------------
# Small-head-dim cross attention (SAM decoder token <-> image)
# ---------------------------------------------------------------------------
# The decoder's cross-attention runs 8 heads of dim 16 (internal 128). On
# TPU a head dim of 16 fills 16 of 128 lanes, so per-head kernels waste 8x
# VMEM/MXU, and the XLA path materializes the f32 score + probability
# tensors in HBM (~1.6 GB/frame at B=256 prompts over L=4096 image rows,
# PERF.md 6h). Trick: block-diagonally EXPAND the token side so row (h, t)
# carries head h's 16 dims in lanes [16h, 16h+16) and zeros elsewhere. Then
#
#   scores[(h,t), l] = Q_exp[(h,t), :] . K_img[l, :]
#
# is ONE full-128-lane MXU dot for all heads at once (the zero lanes of the
# other heads contribute nothing), and the pv contraction works the same
# way, with block-diagonality routing each head's probabilities to its own
# output lanes. Both kernels keep the f32 scores entirely in VMEM and read
# the image-side tensors exactly once.

def _expand_blockdiag(x: Array, heads: int) -> Array:
    """(B, T, h*dh) -> (B, h*T, h*dh): row (h, t) holds x[b, t, h-block] in
    lane block h, zeros elsewhere."""
    B, T, D = x.shape
    dh = D // heads
    z = x.reshape(B, T, heads, dh)
    eye = jnp.eye(heads, dtype=x.dtype)
    out = jnp.einsum("bthd,hg->bhtgd", z, eye)
    return out.reshape(B, heads * T, D)


def _extract_blockdiag(x: Array, heads: int, T: int) -> Array:
    """Inverse read-out of _expand_blockdiag on the OUTPUT side: row (h, t)
    block h -> (B, T, h*dh)."""
    B, HT, D = x.shape
    dh = D // heads
    o5 = x.reshape(B, heads, HT // heads, heads, dh)[:, :, :T]
    eye = jnp.eye(heads, dtype=x.dtype)
    return jnp.einsum("bhtgd,hg->btgd", o5, eye).reshape(B, T, D)


def _crossq_kernel(qexp_ref, k_ref, v_ref, o_ref, *, scale: float):
    """tokens -> image: q_exp (HT, D) block-diag; k/v (L, D) image rows.
    Row softmax over L, scores VMEM-only."""
    q = qexp_ref[0]
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _crossk_kernel(q_ref, kexp_ref, vexp_ref, o_ref, *, scale: float,
                   heads: int, t_len: int):
    """image -> tokens: q (L, D) image rows; k/v_exp (HT, D) block-diag
    tokens. Scores computed TRANSPOSED (HT, L) so the per-head softmax over
    t reduces along sublane groups; the final dot contracts the (h, t) axis,
    block-diagonality separating heads."""
    kx = kexp_ref[0]                                   # (HT, D)
    HT = kx.shape[0]
    T = HT // heads
    s = jax.lax.dot_general(kx, q_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s3 = s.reshape(heads, T, -1)                       # (h, t, L)
    if t_len < T:
        t_ids = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
        s3 = jnp.where(t_ids < t_len, s3, -1e30)
    m = jnp.max(s3, axis=1, keepdims=True)
    p = jnp.exp(s3 - m)
    p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(vexp_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p.reshape(HT, -1), vexp_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def cross_vmem_bytes(HT: int, L: int, D: int, itemsize: int) -> int:
    """Per-grid-step footprint of either cross kernel: double-buffered
    image-side blocks (two of (L, D) for t2i k/v, q+out for i2t) + token
    blocks, plus the (HT, L) f32 score tile, its exp, and the cast
    probability tile."""
    io = 2 * itemsize * (2 * L * D + 2 * HT * D)
    inter = HT * L * (4 + 4 + itemsize)
    return io + inter


def _cross_fits(HT: int, L: int, D: int, itemsize: int) -> bool:
    return (D == 128 and HT % 8 == 0 and L % 128 == 0
            and cross_vmem_bytes(HT, L, D, itemsize) <= _VMEM_BUDGET)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _crossq_call(qexp, k, v, *, heads, scale, interpret=False):
    B, HT, D = qexp.shape
    Bk, L = k.shape[0], k.shape[1]
    kmap = (lambda i: (i, 0, 0)) if Bk > 1 else (lambda i: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_crossq_kernel, scale=scale),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, HT, D), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, L, D), kmap),
                  pl.BlockSpec((1, L, D), kmap)],
        out_specs=pl.BlockSpec((1, HT, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HT, D), qexp.dtype),
        interpret=interpret,
    )(qexp, k, v)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "t_len",
                                             "interpret"))
def _crossk_call(q, kexp, vexp, *, heads, scale, t_len, interpret=False):
    Bq, L, D = q.shape
    HT = kexp.shape[1]
    Bk = kexp.shape[0]
    B = max(Bq, Bk)
    # batch-1 operands are shared across the grid (constant block index),
    # never materializing the (B, L, D) broadcast in HBM
    qmap = (lambda i: (i, 0, 0)) if Bq > 1 else (lambda i: (0, 0, 0))
    kmap = (lambda i: (i, 0, 0)) if Bk > 1 else (lambda i: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_crossk_kernel, scale=scale, heads=heads,
                          t_len=t_len),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, L, D), qmap),
                  pl.BlockSpec((1, HT, D), kmap),
                  pl.BlockSpec((1, HT, D), kmap)],
        out_specs=pl.BlockSpec((1, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        interpret=interpret,
    )(q, kexp, vexp)


def _xla_cross(qq: Array, kk: Array, vv: Array, heads: int) -> Array:
    """Reference path: split heads, xla_attention, merge heads. Operands
    are PRE-head-split (B, L, h*dh); the two batches may differ (image side
    enters batch-1 in the decoder's first layer)."""
    B = max(qq.shape[0], kk.shape[0])
    D = qq.shape[-1]
    dh = D // heads

    def heads_of(t):
        h = t.reshape(t.shape[0], t.shape[1], heads, dh).transpose(0, 2, 1, 3)
        if h.shape[0] != B:
            h = jnp.broadcast_to(h, (B,) + h.shape[1:])
        return h

    o = xla_attention(heads_of(qq), heads_of(kk), heads_of(vv))
    return o.transpose(0, 2, 1, 3).reshape(B, qq.shape[1], D)


def _crossq_proj_kernel(qexp_ref, keys_ref, wk_ref, wv_ref, pek_ref,
                        bv_ref, o_ref, *, scale: float):
    """tokens -> image with the image-side projections folded in
    ALGEBRAICALLY -- kk/vv never exist, even in VMEM:

      s = qexp @ (keys @ Wk + pe)^T = (qexp @ Wk^T) @ keys^T + qexp @ pe^T
      o = p @ (keys @ Wv + bv)      = (p @ keys) @ Wv + bv   (sum p = 1)

    Replaces two 805 MB convolution_add fusions per two-way layer at the
    AMG shape (the kk/vv materializations) with one read of the raw keys
    stream; all three dots contract full 128/256 lanes."""
    q = qexp_ref[0]                                     # (HT, D) bf16
    keys = keys_ref[0]                                  # (L, dk) bf16
    # q' = qexp @ Wk^T: (HT, dk), tiny
    qk = jax.lax.dot_general(q, wk_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(q.dtype)
    s = jax.lax.dot_general(qk, keys, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(q, pek_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(keys.dtype)
    pk = jax.lax.dot_general(p, keys, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(keys.dtype)       # (HT, dk)
    o = jax.lax.dot_general(pk, wv_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o + bv_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _crossq_proj_call(qexp, keys, wk, wv, pek, bv, *, scale,
                      interpret=False):
    B, HT, D = qexp.shape
    Bk, L, dk = keys.shape
    kmap = (lambda i: (i, 0, 0)) if Bk > 1 else (lambda i: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_crossq_proj_kernel, scale=scale),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, HT, D), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, L, dk), kmap),
                  pl.BlockSpec((dk, D), lambda i: (0, 0)),
                  pl.BlockSpec((dk, D), lambda i: (0, 0)),
                  pl.BlockSpec((1, L, D), lambda i: (0, 0, 0)),
                  pl.BlockSpec((D,), lambda i: (0,))],
        out_specs=pl.BlockSpec((1, HT, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HT, D), qexp.dtype),
        interpret=interpret,
    )(qexp, keys, wk, wv, pek, bv)


def _crossk_proj_kernel(keys_ref, wq_ref, peq_ref, kexp_ref, vexp_ref,
                        o_ref, *, scale: float, heads: int, t_len: int):
    """image -> tokens with the image-side qq projection folded in
    algebraically (qq never materializes):

      s = kexp @ (keys @ Wq + pe)^T = (kexp @ Wq^T) @ keys^T + kexp @ pe^T

    token-side kexp/vexp stay pre-expanded (tiny). Same transposed-scores
    trick as _crossk_kernel."""
    keys = keys_ref[0]                                  # (L, dk)
    kx = kexp_ref[0]                                    # (HT, D)
    kq = jax.lax.dot_general(kx, wq_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(kx.dtype)         # (HT, dk)
    s = jax.lax.dot_general(kq, keys, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(kx, peq_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = s * scale                                       # (HT, L)
    HT = kx.shape[0]
    T = HT // heads
    s3 = s.reshape(heads, T, -1)
    if t_len < T:
        t_ids = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
        s3 = jnp.where(t_ids < t_len, s3, -1e30)
    m = jnp.max(s3, axis=1, keepdims=True)
    p = jnp.exp(s3 - m)
    p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(vexp_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p.reshape(HT, -1), vexp_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "t_len",
                                             "interpret"))
def _crossk_proj_call(keys, wq, peq, kexp, vexp, *, heads, scale, t_len,
                      interpret=False):
    Bq, L, dk = keys.shape
    HT = kexp.shape[1]
    D = kexp.shape[2]
    Bk = kexp.shape[0]
    B = max(Bq, Bk)
    qmap = (lambda i: (i, 0, 0)) if Bq > 1 else (lambda i: (0, 0, 0))
    kmap = (lambda i: (i, 0, 0)) if Bk > 1 else (lambda i: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_crossk_proj_kernel, scale=scale, heads=heads,
                          t_len=t_len),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, L, dk), qmap),
                  pl.BlockSpec((dk, D), lambda i: (0, 0)),
                  pl.BlockSpec((1, L, D), lambda i: (0, 0, 0)),
                  pl.BlockSpec((1, HT, D), kmap),
                  pl.BlockSpec((1, HT, D), kmap)],
        out_specs=pl.BlockSpec((1, L, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, D), keys.dtype),
        interpret=interpret,
    )(keys, wq, peq, kexp, vexp)


def _crossk_proj_ln_kernel(keys_ref, wq_ref, peq_ref, kexp_ref, vexp_ref,
                           wout_ref, bout_ref, lns_ref, lnb_ref, o_ref, *,
                           scale: float, heads: int, t_len: int, eps: float):
    """image -> tokens cross attention with the WHOLE image-side tail fused:
    attention (qq in-kernel as in _crossk_proj_kernel) -> out-projection ->
    keys residual -> LayerNorm, one keys read, one keys2 write.

    The XLA chain materializes the (B, L, D) attention output, the
    (B, L, dk) projected tensor, and the (B, L, dk) residual sum in HBM
    (crossk 1.2 ms + conv_add 1.2 ms + res_ln 2.4 ms traced per layer at
    the AMG shape); here the keys block is already VMEM-resident as the
    attention's query source, so the tail costs no extra HBM traffic at
    all. Intermediate dtypes match the XLA chain exactly: attention output
    cast to the stream dtype, out-proj accumulated in f32 + bias then cast
    (= conv_add), residual + LN statistics in f32 (= _res_ln_kernel)."""
    keys = keys_ref[0]                                  # (BL, dk)
    kx = kexp_ref[0]                                    # (HT, D)
    kq = jax.lax.dot_general(kx, wq_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(kx.dtype)         # (HT, dk)
    s = jax.lax.dot_general(kq, keys, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + jax.lax.dot_general(kx, peq_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = s * scale                                       # (HT, BL)
    HT = kx.shape[0]
    T = HT // heads
    s3 = s.reshape(heads, T, -1)
    if t_len < T:
        t_ids = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 1)
        s3 = jnp.where(t_ids < t_len, s3, -1e30)
    m = jnp.max(s3, axis=1, keepdims=True)
    p = jnp.exp(s3 - m)
    p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(vexp_ref.dtype)
    attn = jax.lax.dot_general(
        p.reshape(HT, -1), vexp_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(keys.dtype)  # (BL, D)
    y = jax.lax.dot_general(attn, wout_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = (y + bout_ref[...].astype(jnp.float32)).astype(keys.dtype)
    x = y.astype(jnp.float32) + keys.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    cen = x - mean
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    out = cen * jax.lax.rsqrt(var + eps)
    out = out * lns_ref[...].astype(jnp.float32) \
        + lnb_ref[...].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "t_len",
                                             "eps", "interpret"))
def _crossk_proj_ln_call(keys, wq, peq, kexp, vexp, wout, bout, lns, lnb, *,
                         heads, scale, t_len, eps, interpret=False):
    Bq, L, dk = keys.shape
    HT, D = kexp.shape[1], kexp.shape[2]
    Bk = kexp.shape[0]
    B = max(Bq, Bk)
    BL = _cross_proj_ln_block(HT, L, D, dk, keys.dtype.itemsize)
    qmap = (lambda i, j: (i, j, 0)) if Bq > 1 else (lambda i, j: (0, j, 0))
    kmap = (lambda i, j: (i, 0, 0)) if Bk > 1 else (lambda i, j: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_crossk_proj_ln_kernel, scale=scale, heads=heads,
                          t_len=t_len, eps=eps),
        grid=(B, L // BL),
        in_specs=[pl.BlockSpec((1, BL, dk), qmap),
                  pl.BlockSpec((dk, D), lambda i, j: (0, 0)),
                  pl.BlockSpec((1, BL, D), lambda i, j: (0, j, 0)),
                  pl.BlockSpec((1, HT, D), kmap),
                  pl.BlockSpec((1, HT, D), kmap),
                  pl.BlockSpec((D, dk), lambda i, j: (0, 0)),
                  pl.BlockSpec((dk,), lambda i, j: (0,)),
                  pl.BlockSpec((dk,), lambda i, j: (0,)),
                  pl.BlockSpec((dk,), lambda i, j: (0,))],
        out_specs=pl.BlockSpec((1, BL, dk), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, dk), keys.dtype),
        interpret=interpret,
    )(keys, wq, peq, kexp, vexp, wout, bout, lns, lnb)


def cross_proj_ln_vmem_bytes(HT: int, BL: int, D: int, dk: int,
                             itemsize: int) -> int:
    """Per-grid-step footprint of the i2t tail-fused kernel: double-buffered
    keys/out blocks + pe block + token blocks, score/exp tiles, the f32
    attention/out-proj/residual intermediates, and the small weights."""
    io = 2 * itemsize * (2 * BL * dk + BL * D + 2 * HT * D)
    inter = HT * BL * (4 + 4 + itemsize) + 4 * BL * D + 2 * 4 * BL * dk
    weights = itemsize * (2 * dk * D) + 4 * 3 * dk
    return io + inter + weights


def _cross_proj_ln_block(HT: int, L: int, D: int, dk: int,
                         itemsize: int) -> int | None:
    for bl in (2048, 1024, 512, 256, 128):
        if L % bl == 0 and cross_proj_ln_vmem_bytes(
                HT, bl, D, dk, itemsize) <= _VMEM_BUDGET:
            return bl
    return None


def _cross_proj_ln_fits(HT: int, L: int, D: int, dk: int,
                        itemsize: int) -> bool:
    return (D == 128 and dk % 128 == 0 and HT % 8 == 0
            and _cross_proj_ln_block(HT, L, D, dk, itemsize) is not None)


def cross_i2t_tail_from_keys(keys: Array, wq: Array, pe_q: Array,
                             kk_tok: Array, vv_tok: Array, wout: Array,
                             bout: Array, ln_scale: Array, ln_bias: Array,
                             heads: int, eps: float = 1e-5,
                             interpret: bool = False) -> Array:
    """Image -> token cross attention PLUS its image-side tail (out-proj,
    keys residual, LayerNorm) in one kernel: returns the next layer's keys
    (B, L, dk) directly. keys may be batch-1 (first two-way layer); the
    output is per-prompt. Caller gates with _cross_proj_ln_fits."""
    D = kk_tok.shape[-1]
    dh = D // heads
    T = kk_tok.shape[1]
    pad_t = (-T) % 8
    k_in = jnp.pad(kk_tok, ((0, 0), (0, pad_t), (0, 0))) if pad_t \
        else kk_tok
    v_in = jnp.pad(vv_tok, ((0, 0), (0, pad_t), (0, 0))) if pad_t \
        else vv_tok
    kexp = _expand_blockdiag(k_in, heads)
    vexp = _expand_blockdiag(v_in, heads)
    return _crossk_proj_ln_call(
        keys, wq.astype(keys.dtype), pe_q.astype(keys.dtype), kexp, vexp,
        wout.astype(keys.dtype), bout, ln_scale, ln_bias,
        heads=heads, scale=dh ** -0.5, t_len=T, eps=eps,
        interpret=interpret)


def cross_proj_vmem_bytes(HT: int, L: int, D: int, dk: int,
                          itemsize: int) -> int:
    """Per-grid-step footprint of the projection-fused cross kernels.
    The algebraic form never materializes kk/vv/qq -- not even in VMEM:
    double-buffered keys (L, dk) + pe (L, D) + token/output blocks (the
    i2t output is the worst case, (L, D)), plus the (HT, L) f32 score
    tile, its exp, and the cast probability tile."""
    io = 2 * itemsize * (L * dk + 2 * L * D + 2 * HT * D)
    inter = HT * L * (4 + 4 + itemsize)
    return io + inter


def _cross_proj_fits(HT: int, L: int, D: int, dk: int,
                     itemsize: int) -> bool:
    return (D == 128 and dk % 128 == 0 and HT % 8 == 0 and L % 128 == 0
            and cross_proj_vmem_bytes(HT, L, D, dk, itemsize)
            <= _VMEM_BUDGET)


def cross_t2i_from_keys(q_proj: Array, keys: Array, wk: Array, wv: Array,
                        pe_k: Array, bv: Array, heads: int,
                        interpret: bool = False) -> Array:
    """Token -> image cross attention reading the RAW (B, L, dk) keys
    stream, computing kk/vv in-kernel (projection weights wk/wv (dk, D),
    batch-1 positional correction pe_k (1, L, D) = image_pe @ Wk + bk,
    value bias bv (D,)). Output is pre-out-proj (B, Lq, D). Caller
    guarantees TPU + fit (dispatched from decoder.two_way_transformer)."""
    B = max(q_proj.shape[0], keys.shape[0])
    Lq, D = q_proj.shape[1], q_proj.shape[2]
    dh = D // heads
    pad_t = (-Lq) % 8
    q_in = jnp.pad(q_proj, ((0, 0), (0, pad_t), (0, 0))) if pad_t \
        else q_proj
    qexp = _expand_blockdiag(q_in, heads)
    if qexp.shape[0] != B:
        qexp = jnp.broadcast_to(qexp, (B,) + qexp.shape[1:])
    o = _crossq_proj_call(qexp, keys, wk.astype(keys.dtype),
                          wv.astype(keys.dtype), pe_k.astype(keys.dtype),
                          bv, scale=dh ** -0.5, interpret=interpret)
    return _extract_blockdiag(o, heads, Lq)


def cross_i2t_from_keys(keys: Array, wq: Array, pe_q: Array, kk_tok: Array,
                        vv_tok: Array, heads: int,
                        interpret: bool = False) -> Array:
    """Image -> token cross attention reading the RAW keys stream,
    computing the image-side qq in-kernel (pe_q (1, L, D) = image_pe @ Wq
    + bq). kk_tok/vv_tok are the pre-projected (B, T, D) token tensors.
    Output (B, L, D)."""
    D = kk_tok.shape[-1]
    dh = D // heads
    T = kk_tok.shape[1]
    pad_t = (-T) % 8
    k_in = jnp.pad(kk_tok, ((0, 0), (0, pad_t), (0, 0))) if pad_t \
        else kk_tok
    v_in = jnp.pad(vv_tok, ((0, 0), (0, pad_t), (0, 0))) if pad_t \
        else vv_tok
    kexp = _expand_blockdiag(k_in, heads)
    vexp = _expand_blockdiag(v_in, heads)
    return _crossk_proj_call(keys, wq.astype(keys.dtype),
                             pe_q.astype(keys.dtype), kexp, vexp,
                             heads=heads, scale=dh ** -0.5, t_len=T,
                             interpret=interpret)


def cross_attention_small_head(qq: Array, kk: Array, vv: Array, heads: int,
                               *, impl: str = "auto") -> Array:
    """Multi-head attention for PRE-head-split (B, Lq, D) x (B', Lk, D)
    operands where D = heads * dh with a SMALL dh (the SAM decoder's
    token <-> image cross attention, dh = 16). One side must be short
    (<= 64 rows); the short side is block-diagonally expanded so both dots
    run at full 128 lanes and the f32 scores stay in VMEM. Falls back to
    the XLA path off-TPU / for unfit shapes / under OVO_NO_PALLAS=1.

    qq/kk/vv carry batch B or 1 (batch-1 operands are shared across the
    grid without materializing the broadcast)."""
    import os

    B = max(qq.shape[0], kk.shape[0])
    Lq, Lk, D = qq.shape[1], kk.shape[1], qq.shape[-1]
    dh = D // heads
    scale = dh ** -0.5
    no_pallas = os.environ.get("OVO_NO_PALLAS") == "1"
    t2i = Lq <= 64 and Lk > 64
    i2t = Lk <= 64 and Lq > 64
    short = Lq if t2i else Lk
    pad_t = (-short) % 8
    HT = heads * (short + pad_t)
    long_len = Lk if t2i else Lq
    if (impl == "xla" or no_pallas or not _on_tpu() or not (t2i or i2t)
            or not _cross_fits(HT, long_len, D, qq.dtype.itemsize)):
        return _xla_cross(qq, kk, vv, heads)

    if t2i:
        q_in = jnp.pad(qq, ((0, 0), (0, pad_t), (0, 0))) if pad_t else qq
        qexp = _expand_blockdiag(q_in, heads)
        if qexp.shape[0] != B:
            qexp = jnp.broadcast_to(qexp, (B,) + qexp.shape[1:])
        o = _crossq_call(qexp, kk, vv, heads=heads, scale=scale)
        return _extract_blockdiag(o, heads, Lq)
    # i2t
    k_in = jnp.pad(kk, ((0, 0), (0, pad_t), (0, 0))) if pad_t else kk
    v_in = jnp.pad(vv, ((0, 0), (0, pad_t), (0, 0))) if pad_t else vv
    kexp = _expand_blockdiag(k_in, heads)
    vexp = _expand_blockdiag(v_in, heads)
    return _crossk_call(qq, kexp, vexp, heads=heads, scale=scale,
                        t_len=Lk)

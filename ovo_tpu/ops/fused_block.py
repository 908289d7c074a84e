"""Whole-block Pallas fusion for dense (non-windowed) transformer blocks.

Motivation (PERF.md finding 6): the PE/text towers execute as ~15 medium
XLA ops per block; on the attached TPU runtime each op carries a fixed
overhead far above its roofline, so the tower is op-count bound, not
FLOP bound. These kernels collapse one pre-LN transformer block into TWO
pallas_calls:

  fused_attn_block : LN1 -> qkv -> (RoPE-2D) -> per-head attention ->
                     out-proj -> residual, grid over heads with the
                     out-projection accumulated in a VMEM scratch
  fused_mlp_block  : LN2 -> fc -> gelu -> proj -> residual, grid over
                     hidden-dim chunks with the proj accumulated in VMEM

Shapes stay static: tokens are padded to a sublane-friendly Lp and the
real length masks the attention keys. Weights are pre-arranged per head /
per chunk on the host (cached per params id) so every grid step streams
only its own slice into VMEM.

Numerics: matmuls accumulate in f32 (preferred_element_type), LN/softmax
in f32 -- same recipe as ops/attention + models/layers, so outputs match
the XLA path to bf16 rounding.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG = -1e30


def _pad_len(L: int) -> int:
    return -(-L // 128) * 128


# ---------------------------------------------------------------------------
# attention half
# ---------------------------------------------------------------------------

def _attn_kernel(x_ref, lns_ref, lnb_ref, w_ref, b_ref, ow_ref, ob_ref,
                 cos_ref, sin_ref, o_ref, lnx_ref, acc_ref, *, hd: int,
                 L_real: int, causal: bool, use_rope: bool):
    h = pl.program_id(0)
    n_heads = pl.num_programs(0)
    Lp = x_ref.shape[0]

    @pl.when(h == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        ln = ln * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(
            jnp.float32)
        lnx_ref[:] = ln.astype(x_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qkv = jax.lax.dot_general(
        lnx_ref[:], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0, 0, :].astype(
        jnp.float32)
    q = qkv[:, :hd]
    k = qkv[:, hd:2 * hd]
    v = qkv[:, 2 * hd:]
    if use_rope:
        cos = cos_ref[:].astype(jnp.float32)
        sin = sin_ref[:].astype(jnp.float32)

        def rot(t):
            t1, t2 = t[:, :hd // 2], t[:, hd // 2:]
            return jnp.concatenate(
                [t1 * cos - t2 * sin, t1 * sin + t2 * cos], axis=-1)

        q, k = rot(q), rot(k)
    scores = jax.lax.dot_general(
        q.astype(x_ref.dtype), k.astype(x_ref.dtype),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (hd ** -0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1)
    mask = col >= L_real
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0)
        mask = mask | (col > row)
    scores = jnp.where(mask, _NEG, scores)
    p = jax.nn.softmax(scores, axis=-1).astype(x_ref.dtype)
    oh = jax.lax.dot_general(
        p, v.astype(x_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        oh, ow_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(h == n_heads - 1)
    def _():
        o_ref[:] = (x_ref[:].astype(jnp.float32) + acc_ref[:]
                    + ob_ref[:].astype(jnp.float32)).astype(x_ref.dtype)


def fused_attn_block(x: Array, w_heads: Array, b_heads: Array,
                     ow_heads: Array, out_b: Array, ln_scale: Array,
                     ln_bias: Array, cos: Array, sin: Array, *,
                     n_heads: int, L_real: int, causal: bool,
                     use_rope: bool, interpret: bool = False) -> Array:
    """x (Lp, D) -> x + attn(LN(x)). Weight layout: w_heads
    (heads, D, 3*hd), ow_heads (heads, hd, D), b_heads (heads, 3*hd)."""
    Lp, D = x.shape
    hd = D // n_heads
    grid = (n_heads,)
    return pl.pallas_call(
        functools.partial(_attn_kernel, hd=hd, L_real=L_real, causal=causal,
                          use_rope=use_rope),
        out_shape=jax.ShapeDtypeStruct((Lp, D), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lp, D), lambda h: (0, 0)),                  # x
            pl.BlockSpec((D,), lambda h: (0,)),                       # ln s
            pl.BlockSpec((D,), lambda h: (0,)),                       # ln b
            pl.BlockSpec((1, D, 3 * hd), lambda h: (h, 0, 0)),        # qkv w
            pl.BlockSpec((1, 8, 3 * hd), lambda h: (h, 0, 0)),        # qkv b
            pl.BlockSpec((1, hd, D), lambda h: (h, 0, 0)),            # out w
            pl.BlockSpec((D,), lambda h: (0,)),                       # out b
            pl.BlockSpec((Lp, hd // 2), lambda h: (0, 0)),            # cos
            pl.BlockSpec((Lp, hd // 2), lambda h: (0, 0)),            # sin
        ],
        out_specs=pl.BlockSpec((Lp, D), lambda h: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Lp, D), x.dtype),        # LN(x)
            pltpu.VMEM((Lp, D), jnp.float32),    # out accumulation
        ],
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_heads, b_heads, ow_heads, out_b, cos, sin)


# ---------------------------------------------------------------------------
# mlp half
# ---------------------------------------------------------------------------

def _mlp_kernel(x_ref, lns_ref, lnb_ref, fcw_ref, fcb_ref, pw_ref, pb_ref,
                o_ref, lnx_ref, acc_ref, *, act: str):
    # grid = (token_blocks, hidden_chunks); chunks iterate innermost, so the
    # per-token-block LN/acc state in scratch is complete before the block
    # advances
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        ln = ln * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(
            jnp.float32)
        lnx_ref[:] = ln.astype(x_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = jax.lax.dot_general(
        lnx_ref[:], fcw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + fcb_ref[0, :].astype(
        jnp.float32)
    if act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    elif x_ref.dtype == jnp.bfloat16:   # match layers.gelu dtype dispatch
        h = jax.nn.gelu(h, approximate=True)
    else:
        h = jax.nn.gelu(h, approximate=False)
    acc_ref[:] += jax.lax.dot_general(
        h.astype(x_ref.dtype), pw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(c == n_chunks - 1)
    def _():
        o_ref[:] = (x_ref[:].astype(jnp.float32) + acc_ref[:]
                    + pb_ref[:].astype(jnp.float32)).astype(x_ref.dtype)


def fused_mlp_block(x: Array, fc_w: Array, fc_b: Array, proj_w: Array,
                    proj_b: Array, ln_scale: Array, ln_bias: Array, *,
                    act: str = "gelu", chunk: int = 1024,
                    token_block: Optional[int] = None,
                    interpret: bool = False) -> Array:
    """x (Lp, D) -> x + mlp(LN(x)); grid over (token blocks, hidden chunks).

    ``token_block`` bounds the VMEM footprint for long token streams (e.g.
    Hiera stage tensors): each (token_block, D) slab runs LN + the full
    hidden loop before the grid advances. None = whole Lp in one slab (the
    original dense-tower behavior). Must divide Lp; a non-dividing value
    raises. COST NOTE: every token block re-streams all fc/proj weight
    chunks from HBM, multiplying weight traffic by Lp/token_block -- only
    worth it when the (Lp, hidden) activation slab would not fit VMEM.
    (No library call site passes token_block today: PERF.md 6c measured
    the fused blocks at parity-or-worse vs XLA on the dense towers, so
    they stay opt-in via OVO_FUSED_BLOCK=1.)
    """
    Lp, D = x.shape
    hidden = fc_w.shape[1]
    chunk = min(chunk, hidden)
    if hidden % chunk != 0:
        raise ValueError(
            f"chunk {chunk} must divide mlp hidden dim {hidden}")
    tb = Lp if token_block is None else min(token_block, Lp)
    if Lp % tb != 0:
        raise ValueError(
            f"token_block {tb} must divide token count {Lp}; pick a "
            f"power-of-two factor (Lp here is {Lp})")
    grid = (Lp // tb, hidden // chunk)
    # 1-D chunked bias streams hit XLA/Mosaic tiling mismatches; carry the
    # fc bias as (8, hidden) with a replicated sublane dim
    fc_b2 = jnp.broadcast_to(fc_b[None, :], (8, hidden))
    return pl.pallas_call(
        functools.partial(_mlp_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((Lp, D), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, D), lambda t, c: (t, 0)),       # x
            pl.BlockSpec((D,), lambda t, c: (0,)),            # ln scale
            pl.BlockSpec((D,), lambda t, c: (0,)),            # ln bias
            pl.BlockSpec((D, chunk), lambda t, c: (0, c)),    # fc w chunk
            pl.BlockSpec((8, chunk), lambda t, c: (0, c)),    # fc b chunk
            pl.BlockSpec((chunk, D), lambda t, c: (c, 0)),    # proj w chunk
            pl.BlockSpec((D,), lambda t, c: (0,)),            # proj b
        ],
        out_specs=pl.BlockSpec((tb, D), lambda t, c: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((tb, D), x.dtype),
            pltpu.VMEM((tb, D), jnp.float32),
        ],
        interpret=interpret,
    )(x, ln_scale, ln_bias, fc_w, fc_b2, proj_w, proj_b)


# ---------------------------------------------------------------------------
# block-level wrapper with host-side weight re-arrangement
# ---------------------------------------------------------------------------

def _arrange_attn_weights(p: Dict[str, Any], n_heads: int):
    """qkv (D, 3D) + out (D, D) -> per-head (heads, D, 3*hd) /
    (heads, hd, D) streams."""
    D = p["attn"]["out"]["w"].shape[0]
    hd = D // n_heads
    qkv_w = p["attn"]["qkv"]["w"]                     # (D, 3D): [q|k|v]
    qw, kw, vw = (qkv_w[:, :D], qkv_w[:, D:2 * D], qkv_w[:, 2 * D:])
    per_head = []
    for h in range(n_heads):
        sl = slice(h * hd, (h + 1) * hd)
        per_head.append(jnp.concatenate([qw[:, sl], kw[:, sl], vw[:, sl]],
                                        axis=1))
    w_heads = jnp.stack(per_head)                     # (heads, D, 3hd)
    qkv_b = p["attn"]["qkv"]["b"]
    if qkv_b is None:
        qkv_b = jnp.zeros((3 * D,), jnp.float32)
    qb, kb, vb = qkv_b[:D], qkv_b[D:2 * D], qkv_b[2 * D:]
    b_heads = jnp.stack([
        jnp.concatenate([qb[h * hd:(h + 1) * hd], kb[h * hd:(h + 1) * hd],
                         vb[h * hd:(h + 1) * hd]]) for h in range(n_heads)])
    # Mosaic needs the streamed block's sublane dim divisible by 8: carry
    # the per-head bias as (heads, 8, 3hd) with a replicated dummy sublane
    b_heads = jnp.repeat(b_heads[:, None, :], 8, axis=1)
    ow = p["attn"]["out"]["w"]                        # (D, D)
    ow_heads = jnp.stack([ow[h * hd:(h + 1) * hd] for h in range(n_heads)])
    ob = p["attn"]["out"]["b"]
    if ob is None:
        ob = jnp.zeros((D,), jnp.float32)
    return w_heads, b_heads, ow_heads, ob


_ARRANGED: Dict[int, Any] = {}


def fused_transformer_block(p: Dict[str, Any], x: Array, n_heads: int,
                            rope: Optional[Tuple[Array, Array]] = None,
                            causal: bool = False, act: str = "gelu",
                            l_real: Optional[int] = None,
                            interpret: Optional[bool] = None) -> Array:
    """Drop-in pre-LN block (models/layers.transformer_block semantics,
    no LayerScale) on a TOKEN-PADDED (B, Lp, D) batch; ``rope`` tables must
    already be padded to Lp and ``l_real`` masks the padded keys. The
    per-head weight re-arrangement is cached by the params dict's id
    (weights are immutable once loaded)."""
    key = id(p)
    if key not in _ARRANGED:
        _ARRANGED[key] = _arrange_attn_weights(p, n_heads)
    w_heads, b_heads, ow_heads, ob = _ARRANGED[key]
    if interpret is None:  # interpret off-TPU (CPU tests), Mosaic on TPU
        interpret = jax.devices()[0].platform != "tpu"
    B, Lp, D = x.shape
    hd = D // n_heads
    if rope is not None:
        cos, sin = rope
        cos = cos.astype(jnp.float32)
        sin = sin.astype(jnp.float32)
        use_rope = True
    else:
        cos = jnp.zeros((Lp, hd // 2), jnp.float32)
        sin = jnp.zeros((Lp, hd // 2), jnp.float32)
        use_rope = False

    dt = x.dtype
    attn = functools.partial(
        fused_attn_block, n_heads=n_heads,
        L_real=l_real if l_real is not None else Lp, causal=causal,
        use_rope=use_rope, interpret=interpret)
    mlp = functools.partial(
        fused_mlp_block, act=act,
        chunk=min(512, p["mlp"]["fc"]["w"].shape[1]), interpret=interpret)

    def one(xi):
        h = attn(xi, w_heads.astype(dt), b_heads, ow_heads.astype(dt), ob,
                 p["ln1"]["scale"], p["ln1"]["bias"], cos, sin)
        return mlp(h, p["mlp"]["fc"]["w"].astype(dt), p["mlp"]["fc"]["b"],
                   p["mlp"]["proj"]["w"].astype(dt), p["mlp"]["proj"]["b"],
                   p["ln2"]["scale"], p["ln2"]["bias"])

    return jax.vmap(one)(x)

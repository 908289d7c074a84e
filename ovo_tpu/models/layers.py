"""Shared transformer building blocks (pure functions + param pytrees).

Design: parameters are plain nested dicts of jnp arrays (easy torch->jax
weight conversion and pjit sharding); compute casts to a configurable
``dtype`` (bfloat16 on TPU) with layernorm/softmax in f32. Attention goes
through ops.attention (Pallas flash kernel on TPU).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention

Array = jax.Array
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def linear(p: Params, x: Array) -> Array:
    y = x @ p["w"].astype(x.dtype)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm(p: Params, x: Array, eps: float = 1e-5) -> Array:
    # Stays on XLA: the single-pass Pallas row kernel (ops/layer_norm.py)
    # measured dead even with this fusion at every production shape once
    # dispatch overhead was amortized (PERF.md 6q), so the extra dispatch
    # path is not worth carrying in the hot towers.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: Array) -> Array:
    """Exact-erf gelu for f32 (torch-parity tested), tanh approximation
    for bf16 activations: the exact erf costs ~4 ms per big Hiera tensor
    on the TPU VPU (traced, PERF.md), while the tanh form's max error
    (4.7e-4 abs / 1.8e-4 rel) sits 20x below bf16 resolution (2^-8) --
    the two are equal after bf16 rounding."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: Array) -> Array:
    """x * sigmoid(1.702 x): the OpenAI-CLIP activation the reference's
    DFN '-qg' model cards use (clip_utils.py:58-61)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACTS = {"gelu": gelu, "quick_gelu": quick_gelu}


def mlp(p: Params, x: Array, act=gelu) -> Array:
    return linear(p["proj"], act(linear(p["fc"], x)))


# ---------------------------------------------------------------------------
# RoPE-2D (axial, PE-style): half the head dim rotates with x, half with y
# ---------------------------------------------------------------------------

def rope2d_freqs(grid_h: int, grid_w: int, head_dim: int,
                 theta: float = 10000.0,
                 n_prefix: int = 0) -> Tuple[Array, Array]:
    """Returns (cos, sin) of shape (n_prefix + grid_h*grid_w, head_dim/2).
    Prefix tokens (cls) get identity rotation (freq 0)."""
    assert head_dim % 4 == 0
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    ys, xs = jnp.meshgrid(jnp.arange(grid_h, dtype=jnp.float32),
                          jnp.arange(grid_w, dtype=jnp.float32), indexing="ij")
    ang_x = xs.reshape(-1, 1) * freqs[None, :]   # (L, quarter)
    ang_y = ys.reshape(-1, 1) * freqs[None, :]
    ang = jnp.concatenate([ang_x, ang_y], axis=-1)  # (L, head_dim/2)
    if n_prefix:
        ang = jnp.concatenate(
            [jnp.zeros((n_prefix, ang.shape[-1]), ang.dtype), ang], axis=0)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x (..., L, D) with D even; rotate interleaved pairs."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos.astype(x.dtype)
    s = sin.astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


# ---------------------------------------------------------------------------
# attention / blocks
# ---------------------------------------------------------------------------

def multi_head_attention(p: Params, x: Array, n_heads: int,
                         rope: Optional[Tuple[Array, Array]] = None,
                         causal: bool = False, kv: Optional[Array] = None,
                         attn_impl: str = "auto",
                         n_valid: Optional[int] = None) -> Array:
    """Standard MHA with merged or split qkv params.

    p: {"qkv": {w,b}} or {"q": .., "k": .., "v": ..}, plus {"out": {w,b}}.
    x: (B, L, D); kv: optional (B, Lk, D) for cross attention.
    ``n_valid``: when the caller pre-padded the token axis for the whole
    tower, the real token count -- padded keys are masked out (kernel
    kv_len, or an explicit mask on the fallback path).
    """
    B, L, D = x.shape
    hd = D // n_heads
    src = x if kv is None else kv
    if "qkv" in p:
        qkv = linear(p["qkv"], x)
        if (rope is not None and kv is None and not causal
                and attn_impl in ("auto", "fused")):
            # packed-qkv RoPE kernel: head split + rotation + padding all
            # happen on VMEM tiles inside the attention kernel, and the
            # output lands token-major for the out projection -- no
            # (B, H, L, hd) tensor ever materializes in HBM
            from ..ops.attention import (rope_packed_attention,
                                         use_rope_packed)

            if use_rope_packed(B * n_heads, L, hd, n_heads,
                               qkv.dtype.itemsize):
                cos, sin = rope
                o = rope_packed_attention(qkv, cos[:L], sin[:L],
                                          heads=n_heads, kv_len=n_valid)
                return linear(p["out"], o)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if kv is not None:
            kkv = linear(p["qkv"], kv)
            _, k, v = jnp.split(kkv, 3, axis=-1)
    else:
        q = linear(p["q"], x)
        k = linear(p["k"], src)
        v = linear(p["v"], src)
    Lk = k.shape[1]

    def heads(t, l):
        return t.reshape(B, l, n_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q, L), heads(k, Lk), heads(v, Lk)
    if rope is not None:
        cos, sin = rope
        q = apply_rope(q, cos[:L], sin[:L])
        k = apply_rope(k, cos[:Lk], sin[:Lk])
    mask = None
    if n_valid is not None and n_valid < Lk:
        # fallback path with a pre-padded token stream: mask padded keys
        mask = (jnp.arange(Lk) < n_valid)[None, None, None, :]
    o = dot_product_attention(q, k, v, mask=mask, causal=causal,
                              impl=attn_impl)
    o = o.transpose(0, 2, 1, 3).reshape(B, L, D)
    return linear(p["out"], o)


def transformer_block(p: Params, x: Array, n_heads: int,
                      rope: Optional[Tuple[Array, Array]] = None,
                      causal: bool = False, attn_impl: str = "auto",
                      act: str = "gelu",
                      n_valid: Optional[int] = None) -> Array:
    """Pre-LN block with optional LayerScale (p['ls1']/p['ls2'])."""
    h = multi_head_attention(p["attn"], layer_norm(p["ln1"], x), n_heads,
                             rope=rope, causal=causal, attn_impl=attn_impl,
                             n_valid=n_valid)
    if p.get("ls1") is not None:
        h = h * p["ls1"].astype(h.dtype)
    x = x + h
    h = mlp(p["mlp"], layer_norm(p["ln2"], x), act=ACTS[act])
    if p.get("ls2") is not None:
        h = h * p["ls2"].astype(h.dtype)
    return x + h


# ---------------------------------------------------------------------------
# initializers (random weights; real weights come from convert.py)
# ---------------------------------------------------------------------------

def init_linear(key, d_in: int, d_out: int, bias: bool = True,
                std: Optional[float] = None) -> Params:
    std = std if std is not None else d_in ** -0.5
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((d_out,), jnp.float32) if bias else None}


def init_layer_norm(d: int) -> Params:
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_block(key, width: int, n_heads: int, mlp_ratio: float = 4.0,
               layer_scale: Optional[float] = None) -> Params:
    ks = jax.random.split(key, 4)
    hidden = int(width * mlp_ratio)
    p = {
        "ln1": init_layer_norm(width),
        "attn": {"qkv": init_linear(ks[0], width, 3 * width),
                 "out": init_linear(ks[1], width, width)},
        "ln2": init_layer_norm(width),
        "mlp": {"fc": init_linear(ks[2], width, hidden),
                "proj": init_linear(ks[3], hidden, width)},
    }
    if layer_scale is not None:
        p["ls1"] = jnp.full((width,), layer_scale, jnp.float32)
        p["ls2"] = jnp.full((width,), layer_scale, jnp.float32)
    return p

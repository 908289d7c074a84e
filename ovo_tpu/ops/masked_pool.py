"""Masked single-query attention pooling -- the per-segment hot op.

TextRegion pools one region embedding per mask from the ViT patch grid with
the PE probe head (/root/reference/ovo/entities/textregion.py:163-195):
q = probe (one query per mask), k = LN(mean of tokens) broadcast, v = tokens,
key_padding_mask = mask <= 0. PE/SigLIP attention pooling for the global
embedding is the same computation with k = tokens and an all-True mask.

Layout exploits that the TOKENS ARE SHARED across masks: k/v are (H, L, D)
once, only the (M, L) mask and the (M, H, D) queries vary per mask. The
Pallas kernel fuses score/softmax/weighted-sum per mask with K/V resident in
VMEM; CPU/odd shapes fall back to one einsum chain.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def xla_masked_single_query_attention(q: Array, k: Array, v: Array,
                                      key_mask: Array,
                                      scale: Optional[float] = None) -> Array:
    """q (M, H, D), k/v (H, L, D) shared tokens, key_mask (M, L) True=attend
    -> (M, H, D)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("mhd,hld->mhl", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(key_mask[:, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("mhl,hld->mhd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _pool_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # one (head, mask-block) pair per program: q (1, BM, D), k/v (1, L, D)
    # for this head only (streamed via the grid so VMEM holds one head's
    # tokens, not all heads), mask (BM, L). Clean 2D MXU matmuls.
    m = mask_ref[...]                                  # (BM, L)
    q = q_ref[0].astype(jnp.float32) * scale           # (BM, D)
    k = k_ref[0].astype(jnp.float32)                   # (L, D)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = jnp.where(m > 0, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_m", "interpret"))
def pallas_masked_pool(q: Array, k: Array, v: Array, key_mask: Array, *,
                       scale: float, block_m: int = 32,
                       interpret: bool = False) -> Array:
    M, H, D = q.shape
    L = k.shape[1]
    bm = min(block_m, M)
    pad = (-M) % bm
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, pad), (0, 0)))
    mask_f = key_mask.astype(jnp.float32)
    q_hmd = q.transpose(1, 0, 2)                       # (H, M', D)
    out = pl.pallas_call(
        functools.partial(_pool_kernel, scale=scale),
        grid=(H, (M + pad) // bm),
        in_specs=[
            pl.BlockSpec((1, bm, D), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, L, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, L, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((bm, L), lambda h, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, D), lambda h, i: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, M + pad, D), q.dtype),
        interpret=interpret,
    )(q_hmd, k, v, mask_f)
    return out.transpose(1, 0, 2)[:M]


def masked_single_query_attention(q: Array, k: Array, v: Array,
                                  key_mask: Array,
                                  scale: Optional[float] = None,
                                  impl: str = "auto") -> Array:
    """Dispatcher; see module docstring for shapes."""
    import os

    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    on_tpu = jax.devices()[0].platform == "tpu"
    if os.environ.get("OVO_NO_PALLAS") == "1" and impl == "auto":
        impl = "xla"
    use_pallas = impl == "pallas" or (impl == "auto" and on_tpu)
    if use_pallas:
        return pallas_masked_pool(q, k, v, key_mask, scale=scale,
                                  interpret=not on_tpu)
    return xla_masked_single_query_attention(q, k, v, key_mask, scale=scale)

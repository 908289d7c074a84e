"""Fused SAM-decoder mask tail: upscale2 + bias + high-res skip + gelu +
hypernetwork dot as ONE Pallas kernel.

STATUS: tested utility, NOT the production path. Measured 36.7 ms vs
14.7 ms for the XLA chain standalone at the AMG shapes (B=256, H=W=64) --
the C=3 hypernet output means every store masks 12 of 128 lanes, and the
four per-tap (c1, c2=32) dots underfill the MXU; the HBM saving is eaten
by lane-masked store inefficiency (PERF.md 6i). Also note XLA's
--xla_allow_excess_precision keeps the chain's intermediates above bf16,
so the kernel's faithful bf16 rounding differs by up to ~0.15 in logit
value from the XLA path on TPU (interpret-mode parity vs the literal
bf16 op order is exact, tests/test_sam.py).

The original motivation: at B=256 grid prompts the XLA chain
materializes the second-upscale activation (B, 4H, 4W, 32) -- 1.07 GB
bf16 -- writes it, re-reads it for the hypernet einsum, and pays a
~3.5 ms raster relayout (PERF.md 6d/6h). Each (prompt, row-band) tile of
the final mask logits depends on one tile of the FIRST upscale's
activation plus ~20 KB of weights, so the kernel streams the
first-upscale activation once, keeps the 4x expansion in VMEM, and
writes compact f32 logits:

    read  up1g (B, H*W*4, c1)   537 MB     [gelu(LN(upscale1+hr1))]
    read  hr0q (4, H*W*4, c2)     4 MB     [shared across prompts: the
                                            grid iterates (hband, prompt)
                                            so the block stays resident]
    write masks (B, 4, H*W*4, C) ~200 MB f32

vs ~2.7 GB for the XLA chain. The caller finishes with ONE f32 permute of
the compact output to raster (B, C, 4H, 4W) -- that permute touches 5x
fewer bytes than the bf16 activation relayout it replaces.

Layout note: Mosaic cannot split the lane (minor) dimension of a vector
(e.g. (R, 4*c2) -> (4R, c2) shape casts fail to compile), so the 2x2
output taps are handled as FOUR separate (c1, c2) dots -- one per tap
position (p, q) -- rather than one (c1, 4*c2) dot + reshape.

Numerics match decode_masks' raster path op-for-op: f32 matmul
accumulation cast to bf16, (y + b2) + hr0 in bf16 in that order,
tanh-gelu on bf16, f32 hypernet accumulation.

Reference behavior: SAM2 MaskDecoder.predict_masks upscaling + hypernet
(sam2/modeling/sam/mask_decoder.py); layout notes in decode_masks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array


def _mask_tail_kernel(x_ref, w_ref, b_ref, hr_ref, hyp_ref, o_ref):
    x = x_ref[0]                                        # (R, c1) bf16
    hyp = hyp_ref[0]                                    # (c2, C) bf16
    for pq in range(4):
        y = jax.lax.dot_general(x, w_ref[pq], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # match the XLA path's op order: cast, +bias, +skip, tanh-gelu
        y = y.astype(jnp.bfloat16) + b_ref[...]
        y = y + hr_ref[pq]
        y = jax.nn.gelu(y, approximate=True)
        m = jax.lax.dot_general(y, hyp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, pq] = m                                # (R, C) f32


@functools.partial(jax.jit, static_argnames=("H", "W", "hband",
                                             "interpret"))
def fused_mask_tail(up1g: Array, w2q: Array, b2: Array, hr0q: Array,
                    hyper: Array, *, H: int, W: int, hband: int = 8,
                    interpret: bool = False) -> Array:
    """up1g: (B, H*W*4, c1) bf16, rows in (h, w, i, j) order -- the
    gelu(LN(upscale1 + hr1)) activation flattened; w2q: (4, c1, c2)
    second-upscale taps, leading dim = output tap (p*2+q); b2: (c2,);
    hr0q: (4, H*W*4, c2) high-res skip pre-gathered to (tap, row, ch);
    hyper: (B, C, c2) hypernet outputs.
    Returns (B, 4, H*W*4, C) f32 mask logits, dims (prompt, p*2+q,
    (h, w, i, j) row, channel) -- pixel (4h+2i+p, 4w+2j+q)."""
    B = up1g.shape[0]
    C = hyper.shape[1]
    c1, c2 = up1g.shape[-1], w2q.shape[-1]
    assert H % hband == 0, (H, hband)
    n_hb = H // hband
    rows = hband * W * 4
    hyp_t = jnp.swapaxes(hyper, 1, 2)                   # (B, c2, C)
    b2_2d = b2.reshape(1, -1)

    return pl.pallas_call(
        _mask_tail_kernel,
        # hband outer / prompt inner: the hr0q block index only changes
        # with hband, so it is NOT re-fetched across the B inner steps
        grid=(n_hb, B),
        in_specs=[
            pl.BlockSpec((1, rows, c1), lambda hb, b: (b, hb, 0)),
            pl.BlockSpec((4, c1, c2), lambda hb, b: (0, 0, 0)),
            pl.BlockSpec((1, c2), lambda hb, b: (0, 0)),
            pl.BlockSpec((4, rows, c2), lambda hb, b: (0, hb, 0)),
            pl.BlockSpec((1, c2, C), lambda hb, b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 4, rows, C), lambda hb, b: (b, 0, hb, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 4, H * W * 4, C), jnp.float32),
        interpret=interpret,
    )(up1g, w2q, b2_2d, hr0q, hyp_t)


def mask_tail_to_raster(masks4: Array, H: int, W: int) -> Array:
    """(B, 4, H*W*4, C) kernel output -> raster (B, C, 4H, 4W) f32.
    One small f32 permute (the kernel's compact output is ~5x smaller
    than the bf16 activation the XLA path had to relayout)."""
    B, _, _, C = masks4.shape
    m = masks4.reshape(B, 2, 2, H, W, 2, 2, C)     # (b, p, q, h, w, i, j, c)
    m = m.transpose(0, 7, 3, 5, 1, 4, 6, 2)        # (b, c, h, i, p, w, j, q)
    return m.reshape(B, C, 4 * H, 4 * W)

"""Patch-embed convolutions as space-to-depth + one MXU matmul.

The encoders' patch embeds are strided convs over the full-resolution
image (hiera: 7x7/stride-4 pad-3 on 1024x1024x3, reference SAM2's
``PatchEmbed``; vitdet: 16x16/stride-16, reference SAM1). Lowered through
``lax.conv_general_dilated`` XLA rewrites them into its preferred conv
layout, paying ~2.8 ms/keyframe of pure relayout copies around ~0.02 ms
of MXU work (round-4 AMG trace: an NHWC->NCHW input copy at 0.75 ms plus
a T(2,128)-laid-out conv fusion at 1.75 ms). Both convs are really one
matmul over rearranged pixels:

- stride == kernel (vitdet): non-overlapping patches -- a pure
  reshape/transpose to (B, Ho, Wo, k*k*Cin) then ``@ (k*k*Cin, C)``.
- stride < kernel (hiera, 7x7/s4): space-to-depth by the stride turns the
  overlapping conv into a 2x2/stride-1 conv over 4x4-blocked channels;
  the 2x2 neighborhood is gathered with four UNIT-stride slices (strided
  raster slices are slow on TPU, PERF.md 6j) and contracted in one
  matmul against the tap-rearranged, zero-padded kernel.

Numerics: the matmul f32-accumulates the same tap products as the conv,
in a different association order -- identical to ~1e-6 in f32, well under
the towers' bf16 tolerance (tests pin both).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def patch_embed_nonoverlap(imgs: Array, w: Array, b: Array | None) -> Array:
    """stride == kernel patch embed. imgs (B, H, W, Cin), w (k, k, Cin, C)
    HWIO -> (B, H/k, W/k, C)."""
    k = w.shape[0]
    B, H, W, Cin = imgs.shape
    assert w.shape[1] == k and H % k == 0 and W % k == 0
    C = w.shape[-1]
    x = imgs.reshape(B, H // k, k, W // k, k, Cin)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // k, W // k, k * k * Cin)
    wf = w.reshape(k * k * Cin, C).astype(x.dtype)
    out = jnp.einsum("bhwk,kc->bhwc", x, wf,
                     preferred_element_type=jnp.float32).astype(imgs.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def patch_embed_s4(imgs: Array, w: Array, b: Array | None) -> Array:
    """7x7 / stride-4 / pad-3 patch embed (hiera). imgs (B, H, W, Cin)
    with H, W multiples of 4; w (7, 7, Cin, C) HWIO -> (B, H/4, W/4, C).

    Output pixel (i, j) covers padded-image rows 4i..4i+6 (pad 3 in
    front), i.e. 4x4 blocks (i, i+1) x (j, j+1) after space-to-depth by
    4. The kernel zero-pads to 8x8 and rearranges to the matching
    (block-offset, phase, cin) channel order.
    """
    B, H, W, Cin = imgs.shape
    assert H % 4 == 0 and W % 4 == 0 and w.shape[:2] == (7, 7)
    C = w.shape[-1]
    Ho, Wo = H // 4, W // 4
    # pad 3 front / 5 back: front aligns tap dy=0 with block phase 0;
    # back reaches H+8, a multiple of 4, with the extra zeros never
    # contributing (tap dy <= 6 and the kernel's 8th phase is zero)
    p = jnp.pad(imgs, ((0, 0), (3, 5), (3, 5), (0, 0)))
    Hb, Wb = Ho + 2, Wo + 2
    x = p.reshape(B, Hb, 4, Wb, 4, Cin).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hb, Wb, 16 * Cin)
    # 2x2/s1 neighborhood via unit-stride slices, channel-concatenated in
    # (bi, bj) outer order to match the kernel rearrangement below
    cat = jnp.concatenate([
        x[:, 0:Ho, 0:Wo], x[:, 0:Ho, 1:Wo + 1],
        x[:, 1:Ho + 1, 0:Wo], x[:, 1:Ho + 1, 1:Wo + 1]], axis=-1)
    # w (7,7,Cin,C) -> zero-pad to (8,8) -> (bi, bj, phase_y, phase_x,
    # Cin, C) -> flat (4*16*Cin, C): index (bi, bj, p, q, c) reads tap
    # (dy=4bi+p, dx=4bj+q)
    wpad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    wf = (wpad.reshape(2, 4, 2, 4, Cin, C).transpose(0, 2, 1, 3, 4, 5)
          .reshape(4 * 16 * Cin, C)).astype(cat.dtype)
    out = jnp.einsum("bhwk,kc->bhwc", cat, wf,
                     preferred_element_type=jnp.float32).astype(imgs.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out

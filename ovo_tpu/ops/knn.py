"""Approximate nearest-neighbour ops on device (replacing simple-knn's
``distCUDA2`` and faiss radius dedup in the Gaussian-SLAM tier,
SURVEY.md section 2.6).

Fixed-shape TPU strategy: order points by interleaved-bit Morton code of
their quantized coordinates, then compare each point against a +/-window of
its sorted neighbours. Spatially close points land close in Morton order, so
a modest window (32-64) captures true nearest neighbours with high
probability; results feed robust statistics (scale init means, dedup gates)
that tolerate the approximation.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_MORTON_BITS = 10  # 1024^3 grid


def _expand_bits(v: Array) -> Array:
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points: Array, lo: Array, hi: Array) -> Array:
    """(N, 3) -> (N,) uint32 Morton codes over the [lo, hi] bounding box."""
    scale = (hi - lo) / (2 ** _MORTON_BITS - 1)
    q = jnp.clip(((points - lo) / jnp.maximum(scale, 1e-12)),
                 0, 2 ** _MORTON_BITS - 1).astype(jnp.uint32)
    return (_expand_bits(q[:, 0]) | (_expand_bits(q[:, 1]) << 1)
            | (_expand_bits(q[:, 2]) << 2))


@functools.partial(jax.jit, static_argnames=("k", "window"))
def approx_knn_mean_dist(points: Array, valid: Array, k: int = 3,
                         window: int = 32) -> Array:
    """Per-point mean distance to ~k nearest neighbours (simple-knn's
    distCUDA2 role: gaussian scale init, gaussian_model.py:138-141)."""
    N = points.shape[0]
    big = jnp.float32(1e9)
    lo = jnp.min(jnp.where(valid[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -big), axis=0)
    codes = morton_codes(points, lo, hi)
    codes = jnp.where(valid, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes)
    sorted_pts = points[order]
    sorted_valid = valid[order]

    def window_dists(shift):
        other = jnp.roll(sorted_pts, shift, axis=0)
        o_valid = jnp.roll(sorted_valid, shift, axis=0)
        d = jnp.linalg.norm(sorted_pts - other, axis=-1)
        return jnp.where(sorted_valid & o_valid, d, jnp.inf)

    shifts = [s for s in range(-window, window + 1) if s != 0]
    dists = jnp.stack([window_dists(s) for s in shifts], axis=1)  # (N, 2w)
    nearest = -jax.lax.top_k(-dists, k)[0]                         # (N, k)
    mean = jnp.mean(jnp.where(jnp.isfinite(nearest), nearest, 0.0), axis=1)
    out = jnp.zeros((N,), jnp.float32).at[order].set(mean)
    return jnp.where(valid, out, 0.0)


@functools.partial(jax.jit, static_argnames=("window",))
def radius_dedup_mask(new_points: Array, new_valid: Array,
                      ref_points: Array, ref_valid: Array, radius: float,
                      window: int = 32) -> Array:
    """True where a new point has NO reference point within ``radius``
    (faiss radius-dedup role, mapper_utils.py:199-232). Both sets are sorted
    together by Morton code; each new point checks its +/-window."""
    Nn = new_points.shape[0]
    pts = jnp.concatenate([new_points, ref_points], axis=0)
    valid = jnp.concatenate([new_valid, ref_valid], axis=0)
    is_new = jnp.concatenate([jnp.ones(Nn, bool),
                              jnp.zeros(ref_points.shape[0], bool)])
    big = jnp.float32(1e9)
    lo = jnp.min(jnp.where(valid[:, None], pts, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], pts, -big), axis=0)
    codes = jnp.where(valid, morton_codes(pts, lo, hi),
                      jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes)
    sp = pts[order]
    sv = valid[order]
    sn = is_new[order]

    close = jnp.zeros(sp.shape[0], bool)
    for s in [x for x in range(-window, window + 1) if x != 0]:
        other = jnp.roll(sp, s, axis=0)
        o_valid = jnp.roll(sv, s, axis=0)
        o_new = jnp.roll(sn, s, axis=0)
        d = jnp.linalg.norm(sp - other, axis=-1)
        close = close | (sv & o_valid & ~o_new & (d < radius))

    keep_sorted = sn & sv & ~close
    keep = jnp.zeros(pts.shape[0], bool).at[order].set(keep_sorted)
    return keep[:Nn]

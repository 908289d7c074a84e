"""Camera tracking by differentiable-rendering pose optimization.

Reference behavior: gaussian_slam/entities/tracker.py:24-215 — initialize
from const-speed extrapolation (or RGB-D odometry / GT), then optimize a
relative quaternion+translation with Adam against color/depth L1 under
alpha/outlier masking with soft-alpha weighting; keep the best-loss pose;
double the iterations when the initial loss is high (tracker.py:153-172).

TPU redesign: the whole optimization is ONE jitted ``lax.fori_loop`` — pose
params, Adam moments, and the best-pose register are loop carry; there are
no host syncs inside the loop. The adaptive 2x-iteration rule becomes a
fixed-iteration program with a mask (iterations beyond the active budget
no-op), keeping the compiled shape static.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...ops.splat import render_gaussians
from .model import GaussianState

Array = jax.Array


def quat_mult(q1: Array, q2: Array) -> Array:
    """wxyz Hamilton product (tracker_utils.py:8-24)."""
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_to_mat(q: Array) -> Array:
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    w, x, y, z = q
    return jnp.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def mat_to_quat(R: Array) -> Array:
    """Rotation matrix -> wxyz quaternion (branch-free Shepperd)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    qs = jnp.stack([
        jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01]),
        jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20]),
        jnp.stack([m02 - m20, m01 + m10, 1 + m11 - m00 - m22, m12 + m21]),
        jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 + m22 - m00 - m11]),
    ])
    diag = jnp.stack([tr, m00, m11, m22])
    best = jnp.argmax(diag)
    q = qs[best]
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)


def const_speed_extrapolate(c2w_prev2: Array, c2w_prev1: Array) -> Array:
    """Constant-velocity pose prediction (tracker_utils.py extrapolation)."""
    rel = c2w_prev1 @ jnp.linalg.inv(c2w_prev2)
    return rel @ c2w_prev1


class TrackResult(NamedTuple):
    w2c: Array        # (4, 4) optimized world-to-camera
    loss: Array       # () best loss
    init_loss: Array  # () loss at the initial pose


@functools.partial(
    jax.jit,
    static_argnames=("img_hw", "iters", "soft_alpha", "filter_alpha",
                     "filter_outlier_depth", "mask_invalid_depth", "tile",
                     "k_per_tile"))
def track_pose(state: GaussianState, image: Array, depth: Array,
               w2c_init: Array, K: Array, *, img_hw: Tuple[int, int],
               iters: int = 60, lr_q: float = 2e-4, lr_t: float = 2e-3,
               color_w: float = 0.5, depth_w: float = 1.0,
               alpha_th: float = 0.98, soft_alpha: bool = True,
               filter_alpha: bool = False, filter_outlier_depth: bool = True,
               mask_invalid_depth: bool = False,
               adaptive_loss_th: float = 0.0,
               tile: int = 16, k_per_tile: int = 64) -> TrackResult:
    """Optimize the camera pose against one RGB-D frame.

    image: (H, W, 3) f32 in [0, 1]; depth: (H, W) f32 (0 = invalid).
    ``adaptive_loss_th`` > 0 doubles the iteration budget when the initial
    loss exceeds it (tracker.py:153-172), as a dynamic ``while_loop`` trip
    count -- one compiled program either way.
    """
    R0 = w2c_init[:3, :3]
    t0 = w2c_init[:3, 3]
    q0 = mat_to_quat(R0)

    scales = state.scales()
    opac = state.opacity()
    cols = state.colors()
    depth_valid = depth > 0

    def render_loss(q, t):
        R = quat_to_mat(q)
        w2c = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
        out = render_gaussians(state.xyz, scales, state.quats, opac, cols,
                               state.valid, w2c, K, img_hw=img_hw,
                               tile=tile, k_per_tile=k_per_tile)
        # masks: EXACT reference composition (tracker.py:81-106) --
        # tracking_mask = valid depth [& alpha coverage] [& 50x-median depth
        # outlier gate]; depth loss always masked; color loss soft-weighted
        # by alpha^3 (optionally also masked) or hard-masked. Losses are
        # SUMS like the reference; Adam's per-parameter normalization makes
        # the trajectory invariant to the scale.
        alpha = out.alpha
        tm = depth_valid
        if filter_alpha:
            tm = tm & (alpha > alpha_th)
        d_err = jnp.abs(out.depth - depth) * depth_valid
        if filter_outlier_depth:
            med = jnp.median(d_err)
            tm = tm & jnp.where(med > 0, d_err < 50.0 * med, True)
        c_l1 = jnp.abs(out.color - image).sum(-1)
        d_l1 = jnp.abs(out.depth - depth) * tm
        if soft_alpha:
            a3 = alpha ** 3
            if mask_invalid_depth:
                c_l1 = c_l1 * tm
            c_l1 = c_l1 * a3
            d_l1 = d_l1 * a3
        else:
            c_l1 = c_l1 * tm
        return color_w * c_l1.sum() + depth_w * d_l1.sum()

    grad_fn = jax.value_and_grad(render_loss, argnums=(0, 1))
    init_loss = render_loss(q0, t0)

    b1, b2, eps = 0.9, 0.999, 1e-8
    budget = jnp.asarray(iters, jnp.int32)
    # adaptive_loss_th is a TRACED scalar so the caller can derive it per
    # frame (reference tracker.py:155-159: init_err_ratio x running median
    # of final losses) without recompiling; <= 0 disables
    th = jnp.asarray(adaptive_loss_th, jnp.float32)
    budget = jnp.where((th > 0) & (init_loss > th), 2 * budget, budget)

    def cond(carry):
        return carry[0] < budget

    def body(carry):
        i, q, t, mq, vq, mt, vt, best_q, best_t, best_loss = carry
        loss, (gq, gt) = grad_fn(q, t)
        better = loss < best_loss
        best_q = jnp.where(better, q, best_q)
        best_t = jnp.where(better, t, best_t)
        best_loss = jnp.where(better, loss, best_loss)
        mq = b1 * mq + (1 - b1) * gq
        vq = b2 * vq + (1 - b2) * gq * gq
        mt = b1 * mt + (1 - b1) * gt
        vt = b2 * vt + (1 - b2) * gt * gt
        step = i + 1
        corr = jnp.sqrt(1 - b2 ** step) / (1 - b1 ** step)
        q = q - lr_q * corr * mq / (jnp.sqrt(vq) + eps)
        t = t - lr_t * corr * mt / (jnp.sqrt(vt) + eps)
        q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
        return i + 1, q, t, mq, vq, mt, vt, best_q, best_t, best_loss

    z4, z3 = jnp.zeros(4), jnp.zeros(3)
    carry = (jnp.zeros((), jnp.int32), q0, t0, z4, z4, z3, z3, q0, t0,
             init_loss)
    carry = jax.lax.while_loop(cond, body, carry)
    bq, bt, bl = carry[7], carry[8], carry[9]

    # final evaluation at the last pose too (tracker keeps best seen)
    w2c = jnp.eye(4).at[:3, :3].set(quat_to_mat(bq)).at[:3, 3].set(bt)
    return TrackResult(w2c=w2c, loss=bl, init_loss=init_loss)

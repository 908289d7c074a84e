"""Differentiable 3D-gaussian splatting for the Gaussian-SLAM backbone tier.

Replaces the reference's CUDA ``gaussian_rasterizer``
(/root/reference/ovo/submodules/gaussian_slam/utils/utils.py:117-183) with a
TPU-native tile-based renderer in pure JAX:

  project gaussians -> per-tile top-K selection by depth (fixed K keeps
  shapes static) -> front-to-back alpha compositing per pixel.

Everything is jnp, so color/depth/alpha gradients flow to every gaussian
parameter through plain autodiff -- no hand-written VJP. Designed for the
mapping/tracking optimization loops (hundreds of thousands of gaussians,
depth-sorted compositing like 3DGS).

APPROXIMATION CAVEAT (vs 3DGS's exact full depth-sorted rasterizer): each
tile composites only its k_per_tile NEAREST gaussians; farther ones are
truncated. The error is the residual transmittance after K gaussians, so
it grows when MANY low-alpha gaussians stack on one tile. Stress-measured
against the exact composite (k_per_tile = G) with 256 gaussians covering
the same tiles (tests/test_knn_splat.py):

  opacity 0.5  (production: pruning drops < ~0.1):  K=64 44.9 dB PSNR,
      K=128 67.4 dB, max |alpha| err 8.4e-2 -> 7e-3
  opacity 0.05 (pathological):                      K=64 31.5 dB,
      K=128 42.5 dB

The Gaussian-SLAM backbone therefore defaults k_per_tile to 128
(backbone.py; config knob mapping.k_per_tile). Convergence to the exact
composite is monotone in K.

RUNTIME MONITORING: every render also returns ``trunc_residual`` -- a
conservative estimate of the compositing weight lost to truncation:
per pixel, the post-K transmittance times the weight n_trunc gaussians
contributing like the nearest truncated one would soak up
(T_K * (1 - (1 - a_{K+1})^n_trunc)), maxed over tiles. 0 means the
render is exact regardless of K; over-estimation only costs an
unnecessary escalation, never a silently wrong render. ``render_gaussians_adaptive`` escalates
k_per_tile through power-of-2 buckets (recompile-bounded) until the
residual clears a threshold or K reaches G (exact compositing); the
Gaussian-SLAM backbone runs this check once per mapped keyframe and
sticks with the escalated bucket (mapping.adaptive_k_per_tile).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class RenderOutput(NamedTuple):
    color: Array   # (H, W, 3)
    depth: Array   # (H, W)
    alpha: Array   # (H, W)
    radii: Array   # (G,) screen-space radius (0 = culled)
    trunc_residual: Array = jnp.float32(0.0)
    # () f32: conservative per-pixel estimate of compositing weight lost
    # to K-truncation, max over tiles: T_K * (1 - (1 - a_{K+1})^n_trunc)
    # (0 when no tile had more touching gaussians than k_per_tile)


def quat_to_rotmat(q: Array) -> Array:
    """(G, 4) wxyz quaternions -> (G, 3, 3) rotations."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


def project_gaussians(xyz: Array, scales: Array, quats: Array, w2c: Array,
                      K: Array, img_hw: Tuple[int, int]
                      ) -> Dict[str, Array]:
    """EWA projection: 3D covariance -> 2D screen-space covariance."""
    H, W = img_hw
    R = quat_to_rotmat(quats)                      # (G, 3, 3)
    S = jax.vmap(jnp.diag)(scales)                 # (G, 3, 3)
    M = R @ S
    cov3d = M @ jnp.swapaxes(M, -1, -2)            # (G, 3, 3)

    Rcw = w2c[:3, :3]
    t = w2c[:3, 3]
    cam = xyz @ Rcw.T + t                          # (G, 3)
    z = cam[:, 2]
    in_front = z > 0.05
    zs = jnp.where(in_front, z, 1.0)
    u = K[0, 0] * cam[:, 0] / zs + K[0, 2]
    v = K[1, 1] * cam[:, 1] / zs + K[1, 2]

    fx, fy = K[0, 0], K[1, 1]
    J = jnp.zeros((xyz.shape[0], 2, 3))
    J = J.at[:, 0, 0].set(fx / zs)
    J = J.at[:, 0, 2].set(-fx * cam[:, 0] / (zs * zs))
    J = J.at[:, 1, 1].set(fy / zs)
    J = J.at[:, 1, 2].set(-fy * cam[:, 1] / (zs * zs))
    T = J @ Rcw                                    # (G, 2, 3)
    cov2d = T @ cov3d @ jnp.swapaxes(T, -1, -2)    # (G, 2, 2)
    # low-pass (anti-alias) like 3DGS: +0.3 px
    cov2d = cov2d + 0.3 * jnp.eye(2)
    det = (cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] ** 2)
    det = jnp.maximum(det, 1e-9)
    inv = jnp.stack([
        jnp.stack([cov2d[:, 1, 1], -cov2d[:, 0, 1]], -1),
        jnp.stack([-cov2d[:, 0, 1], cov2d[:, 0, 0]], -1)], -2) / det[:, None, None]
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))
    on_screen = (u + radius > 0) & (u - radius < W) & \
        (v + radius > 0) & (v - radius < H)
    visible = in_front & on_screen
    return {"uv": jnp.stack([u, v], -1), "z": z, "conic": inv,
            "radius": jnp.where(visible, radius, 0.0), "visible": visible}


@functools.partial(
    jax.jit, static_argnames=("img_hw", "tile", "k_per_tile"))
def render_gaussians(xyz: Array, scales: Array, quats: Array,
                     opacity: Array, colors: Array, valid: Array,
                     w2c: Array, K: Array, *, img_hw: Tuple[int, int],
                     tile: int = 16, k_per_tile: int = 64) -> RenderOutput:
    """Render (color, depth, alpha). All inputs padded to capacity G with a
    ``valid`` mask; opacity already sigmoid-ed, scales exp-ed, colors in
    [0,1] (SH DC term)."""
    H, W = img_hw
    G = xyz.shape[0]
    proj = project_gaussians(xyz, scales, quats, w2c, K, img_hw)
    visible = proj["visible"] & valid
    uv, z, conic = proj["uv"], proj["z"], proj["conic"]
    radius = proj["radius"]

    n_ty = -(-H // tile)
    n_tx = -(-W // tile)
    k_per_tile = min(k_per_tile, G)

    # tile assignment: a gaussian touches tiles overlapped by its radius box
    # -> per-tile top-K nearest (by z). Scored selection keeps shapes static.
    tx0 = jnp.clip(((uv[:, 0] - radius) // tile).astype(jnp.int32), 0, n_tx - 1)
    tx1 = jnp.clip(((uv[:, 0] + radius) // tile).astype(jnp.int32), 0, n_tx - 1)
    ty0 = jnp.clip(((uv[:, 1] - radius) // tile).astype(jnp.int32), 0, n_ty - 1)
    ty1 = jnp.clip(((uv[:, 1] + radius) // tile).astype(jnp.int32), 0, n_ty - 1)

    # select K+1: the extra row is the NEAREST TRUNCATED gaussian, used
    # only by the residual monitor (it never composites)
    k_sel = min(k_per_tile + 1, G)

    def tile_select(ti):
        ty, tx = ti // n_tx, ti % n_tx
        touches = visible & (tx >= tx0) & (tx <= tx1) & (ty >= ty0) & (ty <= ty1)
        score = jnp.where(touches, -z, -jnp.inf)   # nearest first
        top = jax.lax.top_k(score, k_sel)
        idx = top[1]
        ok = jnp.isfinite(top[0])
        n_trunc = jnp.maximum(
            jnp.sum(touches.astype(jnp.int32)) - k_per_tile, 0)
        return idx, ok, n_trunc

    tile_idx, tile_ok, tile_ntr = jax.vmap(tile_select)(
        jnp.arange(n_ty * n_tx))

    # per-tile compositing
    py = jnp.arange(tile)
    px = jnp.arange(tile)
    gy, gx = jnp.meshgrid(py, px, indexing="ij")

    def composite(ti, idx_all, ok_all, n_trunc):
        ty, tx = ti // n_tx, ti % n_tx
        ys = (ty * tile + gy).astype(jnp.float32)
        xs = (tx * tile + gx).astype(jnp.float32)
        idx, ok = idx_all[:k_per_tile], ok_all[:k_per_tile]
        sel_uv = uv[idx_all]
        sel_conic = conic[idx_all]
        sel_op = opacity[idx_all]
        sel_col = colors[idx]
        sel_z = z[idx]
        # sort selected by depth (top_k of -z gives ascending z already)
        dx = xs[None] - sel_uv[:, 0, None, None]
        dy = ys[None] - sel_uv[:, 1, None, None]
        power = -0.5 * (sel_conic[:, 0, 0, None, None] * dx * dx
                        + sel_conic[:, 1, 1, None, None] * dy * dy
                        + 2 * sel_conic[:, 0, 1, None, None] * dx * dy)
        alpha_all = jnp.clip(sel_op[:, None, None] * jnp.exp(power),
                             0.0, 0.999)
        alpha = jnp.where(ok[:, None, None], alpha_all[:k_per_tile], 0.0)
        # front-to-back: T_i = prod_{j<i} (1 - a_j)
        one_m = 1.0 - alpha
        trans = jnp.concatenate(
            [jnp.ones((1, tile, tile)), jnp.cumprod(one_m, axis=0)[:-1]],
            axis=0)
        w = alpha * trans                            # (k, t, t)
        color = jnp.einsum("kij,kc->ijc", w, sel_col,
                           preferred_element_type=jnp.float32)
        depth = jnp.einsum("kij,k->ij", w, sel_z,
                           preferred_element_type=jnp.float32)
        acc = jnp.sum(w, axis=0)
        # truncation residual: CONSERVATIVE estimate of the compositing
        # weight the truncated gaussians could still receive at each
        # pixel -- T_K * (1 - (1 - a_next)^n_trunc), modeling every
        # truncated gaussian as contributing like the NEAREST one (the
        # K+1-th selected row, the only one evaluated). Farther truncated
        # gaussians contribute less (smaller projection, lower weight),
        # so this over-estimates -> unnecessary escalation is the failure
        # mode, never a silently wrong render. A tile merely grazed by
        # radius-box corners has a_next ~ 0 and reports no residual.
        if k_sel > k_per_tile:
            a_next = jnp.where(ok_all[k_per_tile], alpha_all[k_per_tile],
                               0.0)                  # (t, t)
            final_t = trans[-1] * one_m[-1]          # (t, t)
            missed = 1.0 - (1.0 - a_next) ** n_trunc.astype(jnp.float32)
            resid = jnp.max(final_t * missed)
        else:
            resid = jnp.float32(0.0)                 # K = G: exact
        return color, depth, acc, resid

    colors_t, depth_t, acc_t, resid_t = jax.vmap(composite)(
        jnp.arange(n_ty * n_tx), tile_idx, tile_ok, tile_ntr)
    trunc_residual = jnp.max(resid_t)

    def untile(x):
        c = x.shape[3:]
        img = x.reshape(n_ty, n_tx, tile, tile, *c)
        img = jnp.moveaxis(img, 2, 1).reshape(n_ty * tile, n_tx * tile, *c)
        return img[:H, :W]

    return RenderOutput(color=untile(colors_t), depth=untile(depth_t),
                        alpha=untile(acc_t),
                        radii=jnp.where(visible, radius, 0.0),
                        trunc_residual=trunc_residual)


def render_gaussians_adaptive(xyz: Array, scales: Array, quats: Array,
                              opacity: Array, colors: Array, valid: Array,
                              w2c: Array, K: Array, *,
                              img_hw: Tuple[int, int], tile: int = 16,
                              k_per_tile: int = 128,
                              residual_th: float = 0.05,
                              max_k: int = 0) -> Tuple[RenderOutput, int]:
    """Render with runtime K-escalation: if any truncated tile still has
    more than ``residual_th`` transmittance after its K nearest gaussians,
    double k_per_tile (power-of-2 buckets bound recompiles) and re-render,
    up to ``max_k`` (0 = G, i.e. exact compositing). Returns
    (output, k_used) -- callers stick with k_used for subsequent renders
    of the same map. Host-side control: one scalar fetch per attempt."""
    import numpy as np

    G = xyz.shape[0]
    cap = min(max_k or G, G)
    k = min(k_per_tile, cap)
    while True:
        out = render_gaussians(xyz, scales, quats, opacity, colors, valid,
                               w2c, K, img_hw=img_hw, tile=tile,
                               k_per_tile=k)
        if k >= cap or float(np.asarray(out.trunc_residual)) <= residual_th:
            return out, k
        k = min(2 * k, cap)

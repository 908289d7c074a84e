"""Keyframe mapping: seed new gaussians, grow the map, optimize the submap.

Reference behavior: gaussian_slam/entities/mapper.py:25-261 —
  seeding mask: Canny edges for a brand-new submap, else low-alpha +
  depth-error renders (mapper.py:48-71); seed points from masked depth with
  uniform subsampling (mapper.py:73-108); ``grow_submap`` dedups seeds
  against existing gaussians by faiss radius search (mapper.py:171-200,
  mapper_utils.py:199-232); then ~100 Adam iterations against a window of
  sampled keyframes with L1 color + SSIM + depth + isotropic losses and
  mid/final opacity pruning (mapper.py:110-169).

TPU redesign: every stage is fixed-shape. The seeding mask is a gradient-
magnitude edge mask (Sobel — Canny's NMS/hysteresis adds nothing for
seeding); seed subsampling picks a fixed ``max_seeds`` by top-k over hashed
pixel scores restricted to the mask; radius dedup is the Morton-window kNN
op; the optimization loop is ``lax.fori_loop`` with Adam moments in carry
and a keyframe index schedule precomputed on host (same sampling
distribution as mapper_utils.py:9-23: half the draws on the current frame,
half uniform over the window).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ...ops.knn import approx_knn_mean_dist, radius_dedup_mask
from ...ops.splat import render_gaussians
from .losses import isotropic_loss, ssim
from .model import GaussianState, add_points, prune_by_opacity

Array = jax.Array


def sobel_edge_mask(gray: Array, th: float = 0.1) -> Array:
    """Edge mask by Sobel gradient magnitude (mapper.py:48-52 Canny role)."""
    gx = (jnp.roll(gray, -1, 1) - jnp.roll(gray, 1, 1))
    gy = (jnp.roll(gray, -1, 0) - jnp.roll(gray, 1, 0))
    mag = jnp.sqrt(gx * gx + gy * gy)
    return mag > th


@functools.partial(jax.jit, static_argnames=("img_hw", "tile", "k_per_tile"))
def seeding_mask(state: GaussianState, image: Array, depth: Array,
                 w2c: Array, K: Array, is_new_submap: Array, *,
                 img_hw: Tuple[int, int], alpha_th: float = 0.6,
                 depth_err_mult: float = 50.0, tile: int = 16,
                 k_per_tile: int = 64) -> Array:
    """Pixels that should seed new gaussians (mapper.py:48-71)."""
    out = render_gaussians(state.xyz, state.scales(), state.quats,
                           state.opacity(), state.colors(), state.valid,
                           w2c, K, img_hw=img_hw, tile=tile,
                           k_per_tile=k_per_tile)
    d_err = jnp.abs(out.depth - depth)
    med = jnp.median(jnp.where(depth > 0, d_err, 0.0))
    uncovered = (out.alpha < alpha_th) | (
        (depth > 0) & (d_err > depth_err_mult * jnp.maximum(med, 1e-6)))
    # a brand-new submap seeds every valid-depth pixel (select_seeds gives
    # edge pixels priority, covering the reference's Canny-edge densification)
    m = jnp.where(is_new_submap, jnp.ones_like(uncovered), uncovered)
    return m & (depth > 0)


@functools.partial(jax.jit, static_argnames=("max_seeds",))
def select_seeds(mask: Array, depth: Array, image: Array, w2c: Array,
                 K: Array, *, max_seeds: int = 16384
                 ) -> Tuple[Array, Array, Array]:
    """Unproject up to ``max_seeds`` masked pixels -> (points, colors, valid).
    Deterministic hash scores stand in for uniform subsampling."""
    H, W = depth.shape
    v, u = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    # low-discrepancy-ish score from pixel index hashing; edge pixels are
    # boosted so high-frequency regions seed first (mapper.py Canny role)
    h = ((u.astype(jnp.uint32) * jnp.uint32(2654435761)
          + v.astype(jnp.uint32) * jnp.uint32(40503))
         & jnp.uint32(0xFFFF)).astype(jnp.int32)
    edge = sobel_edge_mask(image.mean(-1))
    score = h.astype(jnp.float32) + jnp.where(edge, 65536.0, 0.0)
    score = jnp.where(mask, score, -jnp.inf).reshape(-1)
    top = jax.lax.top_k(score, min(max_seeds, score.shape[0]))
    idx = top[1]
    valid = jnp.isfinite(top[0])
    uu = (idx % W).astype(jnp.float32)
    vv = (idx // W).astype(jnp.float32)
    z = depth.reshape(-1)[idx]
    x = (uu - K[0, 2]) * z / K[0, 0]
    y = (vv - K[1, 2]) * z / K[1, 1]
    cam = jnp.stack([x, y, z], -1)
    c2w = jnp.linalg.inv(w2c)
    pts = cam @ c2w[:3, :3].T + c2w[:3, 3]
    cols = image.reshape(-1, 3)[idx]
    return pts, cols, valid


class MapperConfig(NamedTuple):
    iters: int = 60
    lr_xyz: float = 5e-4
    lr_fdc: float = 5e-3
    lr_scale: float = 2e-3
    lr_quat: float = 1e-3
    lr_opacity: float = 2e-2
    color_w: float = 1.0
    ssim_w: float = 0.2
    depth_w: float = 1.0
    iso_w: float = 10.0
    prune_opacity_th: float = 0.1
    max_seeds: int = 16384
    dedup_radius: float = 0.02
    tile: int = 16
    k_per_tile: int = 64
    # gradient densification (0 = off, matching the reference mapper which
    # never invokes its vendored clone/split machinery)
    densify_grad_th: float = 0.0
    densify_percent_dense: float = 0.01
    # reference knobs (slam/gaussian_slam/*.yaml): frame-0 ("new submap" --
    # the reference only ever opens one, gaussian_slam.py:61) gets more
    # iterations and a denser seed budget
    new_submap_iters: int = 0        # ref new_submap_iterations; 0 -> iters
    new_submap_max_seeds: int = 0    # ref new_submap_points_num; 0 -> max_seeds
    current_frame_frac: float = 0.4  # ref current_view_opt_iterations
    alpha_th: float = 0.6            # ref mapping.alpha_thre
    seed_depth_mult: float = 1.005   # ref mapper.py:89 (1.005 * depth)
    # statistical-outlier seed filter (ref grow_submap filter_cloud for
    # TUM/ScanNet: remove_statistical_outlier(40, 2.0)); TPU analogue is the
    # Morton-window kNN mean distance thresholded at mean + std_ratio*std
    filter_seed_outliers: bool = False
    seed_outlier_std: float = 2.0


OPT_FIELDS = ("xyz", "f_dc", "scales_log", "quats", "opacity_logit")


@functools.partial(jax.jit,
                   static_argnames=("img_hw", "cfg", "it0", "n_iters"))
def optimize_phase(state: GaussianState, m0, v0, grad_accum0: Array,
                   denom0: Array, kf_images: Array, kf_depths: Array,
                   kf_w2cs: Array, kf_schedule: Array, K: Array, *,
                   img_hw: Tuple[int, int], cfg: MapperConfig, it0: int,
                   n_iters: int):
    """``n_iters`` Adam steps starting at global step ``it0`` with moments
    carried in/out -- the phase building block that lets map_keyframe run a
    mid-loop densify with the same optimizer trajectory (reference
    mapper.py:110-169 loss; gaussian-splatting densification cadence).
    Also accumulates per-gaussian positional-gradient magnitudes
    (add_densification_stats analogue; world-space ||d loss/d xyz|| stands
    in for the CUDA screen-space mean2D gradient -- same trigger signal, a
    depth/focal scale factor apart)."""
    lrs = {"xyz": cfg.lr_xyz, "f_dc": cfg.lr_fdc, "scales_log": cfg.lr_scale,
           "quats": cfg.lr_quat, "opacity_logit": cfg.lr_opacity}

    def loss_fn(params, kf_i):
        st = state._replace(**params)
        out = render_gaussians(st.xyz, st.scales(), st.quats, st.opacity(),
                               st.colors(), st.valid, kf_w2cs[kf_i], K,
                               img_hw=img_hw, tile=cfg.tile,
                               k_per_tile=cfg.k_per_tile)
        img = kf_images[kf_i]
        dep = kf_depths[kf_i]
        dv = dep > 0
        n = jnp.maximum(dv.sum(), 1)
        c_l1 = jnp.abs(out.color - img).mean()
        s = 1.0 - ssim(out.color, img)
        d_l1 = (jnp.abs(out.depth - dep) * dv).sum() / n
        iso = isotropic_loss(params["scales_log"], state.valid)
        return (cfg.color_w * c_l1 + cfg.ssim_w * s + cfg.depth_w * d_l1
                + cfg.iso_w * iso)

    grad_fn = jax.grad(loss_fn)
    b1, b2, eps = 0.9, 0.999, 1e-8
    params0 = {k: getattr(state, k) for k in OPT_FIELDS}

    def body(i, carry):
        params, m, v, ga, dn = carry
        g = grad_fn(params, kf_schedule[i])
        gnorm = jnp.linalg.norm(g["xyz"], axis=-1)
        ga = ga + jnp.where(state.valid, gnorm, 0.0)
        dn = dn + (state.valid & (gnorm > 0)).astype(jnp.int32)
        step = i + 1
        corr = jnp.sqrt(1 - b2 ** step) / (1 - b1 ** step)
        new_params = {}
        for k in OPT_FIELDS:
            mk = b1 * m[k] + (1 - b1) * g[k]
            vk = b2 * v[k] + (1 - b2) * g[k] * g[k]
            upd = lrs[k] * corr * mk / (jnp.sqrt(vk) + eps)
            # frozen for invalid slots
            mask = state.valid.reshape((-1,) + (1,) * (params[k].ndim - 1))
            new_params[k] = params[k] - jnp.where(mask, upd, 0.0)
            m = dict(m, **{k: mk})
            v = dict(v, **{k: vk})
        return new_params, m, v, ga, dn

    params, m, v, ga, dn = jax.lax.fori_loop(
        it0, it0 + n_iters, body, (params0, m0, v0, grad_accum0, denom0))
    return state._replace(**params), m, v, ga, dn


@functools.partial(jax.jit, static_argnames=("img_hw", "cfg"))
def optimize_submap(state: GaussianState, kf_images: Array, kf_depths: Array,
                    kf_w2cs: Array, kf_schedule: Array, K: Array, *,
                    img_hw: Tuple[int, int], cfg: MapperConfig
                    ) -> GaussianState:
    """~``cfg.iters`` Adam steps of photometric+geometric refinement against
    a window of keyframes (mapper.py:110-169). ``kf_schedule`` (iters,) i32
    indexes into the keyframe window per iteration."""
    params0 = {k: getattr(state, k) for k in OPT_FIELDS}
    m0 = jax.tree_util.tree_map(jnp.zeros_like, params0)
    v0 = jax.tree_util.tree_map(jnp.zeros_like, params0)
    ga0 = jnp.zeros((state.capacity,), jnp.float32)
    dn0 = jnp.zeros((state.capacity,), jnp.int32)
    out, _, _, _, _ = optimize_phase(
        state, m0, v0, ga0, dn0, kf_images, kf_depths, kf_w2cs, kf_schedule,
        K, img_hw=img_hw, cfg=cfg, it0=0, n_iters=cfg.iters)
    return out


def keyframe_sampling_schedule(iters: int, window: int, seed: int,
                               cur_frac: float = 0.4) -> "np":
    """Host-side keyframe index schedule (mapper_utils.py:8-22): the newest
    keyframe draws a ``cur_frac`` share of the iterations (reference
    ``current_view_opt_iterations``), the rest uniform over the OTHER
    keyframes in the window."""
    import numpy as np

    rng = np.random.default_rng(seed)
    if window <= 1:
        return np.zeros(iters, np.int32)
    sched = rng.integers(0, window - 1, size=iters)
    cur = rng.random(iters) < cur_frac
    sched[cur] = window - 1
    return sched.astype(np.int32)


def map_keyframe(state: GaussianState, image: Array, depth: Array,
                 w2c: Array, K: Array, kf_images: Array, kf_depths: Array,
                 kf_w2cs: Array, *, is_new_submap: bool, seed: int,
                 n_live_kfs: int | None = None,
                 img_hw: Tuple[int, int], cfg: MapperConfig
                 ) -> GaussianState:
    """Full mapping step (mapper.py:202-243): seed -> dedup-grow -> optimize
    -> prune. Python-level composition of jitted programs. The keyframe
    window may be padded to a fixed size; ``n_live_kfs`` bounds the sampling
    schedule (the newest live keyframe sits at index n_live_kfs - 1)."""
    m = seeding_mask(state, image, depth, w2c, K,
                     jnp.asarray(is_new_submap), img_hw=img_hw,
                     alpha_th=cfg.alpha_th, tile=cfg.tile,
                     k_per_tile=cfg.k_per_tile)
    # frame 0 opens the (single) submap with a denser seed budget and a
    # longer optimization (ref new_submap_points_num/new_submap_iterations)
    max_seeds = cfg.max_seeds
    n_iters = cfg.iters
    if is_new_submap:
        max_seeds = min(cfg.new_submap_max_seeds or max_seeds,
                        depth.shape[0] * depth.shape[1])
        n_iters = cfg.new_submap_iters or n_iters
    pts, cols, valid = select_seeds(m, depth * cfg.seed_depth_mult, image,
                                    w2c, K, max_seeds=max_seeds)
    if cfg.filter_seed_outliers and not is_new_submap:
        d = approx_knn_mean_dist(pts, valid, k=3)
        dv = jnp.where(valid, d, jnp.nan)
        th = (jnp.nanmean(dv)
              + cfg.seed_outlier_std * jnp.nanstd(dv))
        valid = valid & (d <= th)
    keep = radius_dedup_mask(pts, valid, state.xyz, state.valid,
                             cfg.dedup_radius)
    state = add_points(state, pts, cols, keep)
    window = n_live_kfs if n_live_kfs is not None else kf_images.shape[0]
    sched = jnp.asarray(keyframe_sampling_schedule(
        n_iters, window, seed, cur_frac=cfg.current_frame_frac))
    if cfg.densify_grad_th <= 0:
        state = optimize_submap(state, kf_images, kf_depths, kf_w2cs, sched,
                                K, img_hw=img_hw,
                                cfg=cfg._replace(iters=n_iters))
        return prune_by_opacity(state, cfg.prune_opacity_th)

    # densify cadence: optimize half, clone/split on the accumulated
    # positional-gradient magnitudes, zero the appended slots' Adam moments
    # (densification_postfix analogue), optimize the remaining half
    from .model import densify_clone_split

    params0 = {k: getattr(state, k) for k in OPT_FIELDS}
    m = jax.tree_util.tree_map(jnp.zeros_like, params0)
    v = jax.tree_util.tree_map(jnp.zeros_like, params0)
    ga = jnp.zeros((state.capacity,), jnp.float32)
    dn = jnp.zeros((state.capacity,), jnp.int32)
    half = max(n_iters // 2, 1)
    state, m, v, ga, dn = optimize_phase(
        state, m, v, ga, dn, kf_images, kf_depths, kf_w2cs, sched, K,
        img_hw=img_hw, cfg=cfg, it0=0, n_iters=half)
    grad_avg = ga / jnp.maximum(dn.astype(jnp.float32), 1.0)
    state, appended = densify_clone_split(
        state, grad_avg, jax.random.PRNGKey(seed),
        jnp.asarray(cfg.densify_grad_th, jnp.float32),
        jnp.asarray(cfg.densify_percent_dense, jnp.float32))
    zero = lambda t: jnp.where(  # noqa: E731
        appended.reshape((-1,) + (1,) * (t.ndim - 1)), 0.0, t)
    m = jax.tree_util.tree_map(zero, m)
    v = jax.tree_util.tree_map(zero, v)
    state, _, _, _, _ = optimize_phase(
        state, m, v, ga, dn, kf_images, kf_depths, kf_w2cs, sched, K,
        img_hw=img_hw, cfg=cfg, it0=half, n_iters=n_iters - half)
    return prune_by_opacity(state, cfg.prune_opacity_th)

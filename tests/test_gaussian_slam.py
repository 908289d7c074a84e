"""Gaussian-SLAM backbone tier tests: losses, the fixed-capacity gaussian
map, pose tracking by differentiable rendering, submap mapping, and the
backbone behind the full semantic pipeline.

Reference behavior: /root/reference/ovo/submodules/gaussian_slam/entities/
{losses,gaussian_model,tracker,mapper}.py and /root/reference/ovo/slam/
{gaussian_slam,sem_gaussian_model}.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ovo_tpu.ops.splat import render_gaussians
from ovo_tpu.slam.gaussian.losses import isotropic_loss, l1_loss, ssim
from ovo_tpu.slam.gaussian.mapper import MapperConfig, map_keyframe
from ovo_tpu.slam.gaussian.model import (add_points, from_gaussian_map_dict,
                                         gaussian_map_dict,
                                         init_gaussian_state, n_valid,
                                         prune_by_opacity)
from ovo_tpu.slam.gaussian.tracker import (const_speed_extrapolate,
                                           mat_to_quat, quat_to_mat,
                                           track_pose)

IMG_HW = (48, 64)
K = np.array([[50.0, 0, 31.5], [0, 50.0, 23.5], [0, 0, 1]], np.float32)


def _textured_cloud(n=256, seed=0):
    """A fronto-parallel textured 'wall' of points at z in [2, 2.3]."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.4, 1.4, n)
    y = rng.uniform(-1.0, 1.0, n)
    z = 2.0 + 0.3 * rng.random(n)
    pts = np.stack([x, y, z], -1).astype(np.float32)
    cols = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    return pts, cols


# ---------------------------------------------------------------- losses --
def test_ssim_identity_and_ordering():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    assert float(ssim(a, a)) > 0.999
    noisy = a + 0.3 * jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    assert float(ssim(a, noisy)) < 0.95
    assert float(l1_loss(a, a)) == 0.0


def test_isotropic_loss_zero_for_isotropic():
    s = jnp.zeros((8, 3))
    valid = jnp.ones(8, bool)
    assert float(isotropic_loss(s, valid)) == 0.0
    s2 = s.at[0, 0].set(1.0)
    assert float(isotropic_loss(s2, valid)) > 0


# ----------------------------------------------------------------- model --
def test_add_points_and_prune():
    state = init_gaussian_state(128)
    pts, cols = _textured_cloud(64)
    mask = np.ones(64, bool)
    mask[50:] = False
    state = add_points(state, jnp.asarray(pts), jnp.asarray(cols),
                       jnp.asarray(mask))
    assert n_valid(state) == 50
    ids = np.asarray(state.ids)[np.asarray(state.valid)]
    assert len(np.unique(ids)) == 50
    assert int(state.next_id) == 50

    # second batch fills remaining free slots; overflow dropped
    state = add_points(state, jnp.asarray(pts), jnp.asarray(cols),
                       jnp.ones(64, bool))
    assert n_valid(state) == 114  # 50 + 64 <= 128
    # prune low opacity (all start at 0.5 -> none pruned; force one down)
    state = state._replace(opacity_logit=state.opacity_logit.at[0].set(-5.0))
    pruned = prune_by_opacity(state, 0.1)
    assert n_valid(pruned) == 113
    assert int(pruned.ids[0]) == -1


def test_gaussian_ckpt_roundtrip():
    state = init_gaussian_state(64)
    pts, cols = _textured_cloud(32)
    state = add_points(state, jnp.asarray(pts), jnp.asarray(cols),
                       jnp.ones(32, bool))
    state = state._replace(obj_ids=state.obj_ids.at[:10].set(7))
    d = gaussian_map_dict(state)
    assert d["xyz"].shape == (32, 3)
    assert set(d) >= {"xyz", "obj_ids", "ids", "max_id", "color", "f_dc",
                      "scales_log", "quats", "opacity_logit"}
    state2 = from_gaussian_map_dict(d, 64)
    assert n_valid(state2) == 32
    live = np.asarray(state.valid)
    np.testing.assert_allclose(np.asarray(state2.xyz[:32]),
                               np.asarray(state.xyz)[live], atol=1e-6)
    assert int(state2.next_id) == int(state.next_id)


# --------------------------------------------------------------- tracker --
def test_quat_mat_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(5):
        q = rng.standard_normal(4).astype(np.float32)
        q /= np.linalg.norm(q)
        R = quat_to_mat(jnp.asarray(q))
        q2 = np.asarray(mat_to_quat(R))
        assert (np.allclose(q, q2, atol=1e-5)
                or np.allclose(q, -q2, atol=1e-5))


def test_const_speed_extrapolation():
    a = np.eye(4, dtype=np.float32)
    b = np.eye(4, dtype=np.float32)
    b[0, 3] = 0.1
    c = np.asarray(const_speed_extrapolate(jnp.asarray(a), jnp.asarray(b)))
    assert abs(c[0, 3] - 0.2) < 1e-5


def _fitted_state():
    state = init_gaussian_state(512)
    pts, cols = _textured_cloud(256)
    state = add_points(state, jnp.asarray(pts), jnp.asarray(cols),
                       jnp.ones(256, bool))
    # direct color (invert SH) already handled by add_points; widen opacity
    return state._replace(opacity_logit=jnp.full((512,), 2.0))


def test_track_pose_recovers_perturbation():
    state = _fitted_state()
    w2c_true = np.eye(4, dtype=np.float32)
    out = render_gaussians(state.xyz, state.scales(), state.quats,
                           state.opacity(), state.colors(), state.valid,
                           jnp.asarray(w2c_true), jnp.asarray(K),
                           img_hw=IMG_HW, k_per_tile=32)
    image = out.color
    alpha = np.asarray(out.alpha)
    depth = jnp.asarray(np.where(alpha > 0.5,
                                 np.asarray(out.depth)
                                 / np.maximum(alpha, 1e-6), 0.0))

    w2c_init = w2c_true.copy()
    w2c_init[0, 3] += 0.04  # 4 cm lateral error
    res = track_pose(state, image, depth, jnp.asarray(w2c_init),
                     jnp.asarray(K), img_hw=IMG_HW, iters=80,
                     k_per_tile=32)
    assert float(res.loss) < 0.7 * float(res.init_loss)
    t_err = abs(float(res.w2c[0, 3]) - w2c_true[0, 3])
    assert t_err < 0.03, f"translation error {t_err}"


# ---------------------------------------------------------------- mapper --
def test_map_keyframe_seeds_and_improves():
    rng = np.random.default_rng(2)
    H, W = IMG_HW
    depth = np.full((H, W), 2.0, np.float32)
    image = rng.uniform(0.2, 0.8, (H, W, 3)).astype(np.float32)
    w2c = jnp.asarray(np.eye(4, dtype=np.float32))
    cfg = MapperConfig(iters=25, max_seeds=2048, k_per_tile=32)
    state = init_gaussian_state(8192)
    kf_i = jnp.asarray(image[None])
    kf_d = jnp.asarray(depth[None])
    kf_w = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    state = map_keyframe(state, jnp.asarray(image), jnp.asarray(depth), w2c,
                         jnp.asarray(K), kf_i, kf_d, kf_w,
                         is_new_submap=True, seed=0, img_hw=IMG_HW, cfg=cfg)
    assert n_valid(state) > 500
    out = render_gaussians(state.xyz, state.scales(), state.quats,
                           state.opacity(), state.colors(), state.valid,
                           w2c, jnp.asarray(K), img_hw=IMG_HW, k_per_tile=32)
    alpha = np.asarray(out.alpha)
    assert alpha.mean() > 0.5  # wall covered
    covered = alpha > 0.7
    d_err = np.abs(np.asarray(out.depth) / np.maximum(alpha, 1e-6)
                   - depth)[covered]
    assert np.median(d_err) < 0.05

    # second pass on the same frame must seed (almost) nothing new: the
    # dedup + uncovered mask suppress existing geometry
    n_before = n_valid(state)
    state2 = map_keyframe(state, jnp.asarray(image), jnp.asarray(depth), w2c,
                          jnp.asarray(K), kf_i, kf_d, kf_w,
                          is_new_submap=False, seed=1, img_hw=IMG_HW,
                          cfg=cfg)
    assert n_valid(state2) - n_before < 0.5 * n_before


def test_new_submap_knobs_give_denser_seeds():
    """Frame 0 uses the new_submap seed budget (reference
    new_submap_points_num, mapper.py:93-101), later frames max_seeds."""
    rng = np.random.default_rng(5)
    H, W = IMG_HW
    depth = np.full((H, W), 2.0, np.float32)
    image = rng.uniform(0.2, 0.8, (H, W, 3)).astype(np.float32)
    w2c = jnp.asarray(np.eye(4, dtype=np.float32))
    cfg = MapperConfig(iters=2, max_seeds=256, new_submap_max_seeds=2048,
                       new_submap_iters=3, dedup_radius=1e-7, k_per_tile=32)
    kf_i = jnp.asarray(image[None])
    kf_d = jnp.asarray(depth[None])
    kf_w = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    state = map_keyframe(init_gaussian_state(8192), jnp.asarray(image),
                         jnp.asarray(depth), w2c, jnp.asarray(K), kf_i, kf_d,
                         kf_w, is_new_submap=True, seed=0, img_hw=IMG_HW,
                         cfg=cfg)
    assert n_valid(state) > 1024  # frame 0 seeded past max_seeds

    state2 = map_keyframe(init_gaussian_state(8192), jnp.asarray(image),
                          jnp.asarray(depth), w2c, jnp.asarray(K), kf_i,
                          kf_d, kf_w, is_new_submap=False, seed=0,
                          img_hw=IMG_HW, cfg=cfg)
    assert n_valid(state2) <= 256  # ordinary frames keep the small budget


def test_seed_outlier_filter_drops_isolated_points():
    """filter_seed_outliers (reference grow_submap filter_cloud,
    mapper.py:195-197: remove_statistical_outlier for ScanNet/TUM) drops
    isolated depth-spike seeds but keeps the wall."""
    rng = np.random.default_rng(6)
    H, W = IMG_HW
    depth = np.full((H, W), 2.0, np.float32)
    for r, c in [(10, 10), (30, 50), (40, 20)]:
        depth[r, c] = 30.0  # isolated spikes -> far, lonely 3D points
    image = rng.uniform(0.2, 0.8, (H, W, 3)).astype(np.float32)
    w2c = jnp.asarray(np.eye(4, dtype=np.float32))
    kf_i = jnp.asarray(image[None])
    kf_d = jnp.asarray(depth[None])
    kf_w = jnp.asarray(np.eye(4, dtype=np.float32)[None])

    def run(filter_on):
        cfg = MapperConfig(iters=2, max_seeds=4096, dedup_radius=1e-7,
                           k_per_tile=32, filter_seed_outliers=filter_on,
                           prune_opacity_th=0.0)
        return map_keyframe(init_gaussian_state(8192), jnp.asarray(image),
                            jnp.asarray(depth), w2c, jnp.asarray(K), kf_i,
                            kf_d, kf_w, is_new_submap=False, seed=0,
                            img_hw=IMG_HW, cfg=cfg)

    st_off = run(False)
    far_off = (np.asarray(st_off.xyz)[np.asarray(st_off.valid)][:, 2] > 20)
    assert far_off.sum() == 3  # without the filter the spikes seed

    st_on = run(True)
    pts_on = np.asarray(st_on.xyz)[np.asarray(st_on.valid)]
    assert (pts_on[:, 2] > 20).sum() == 0  # filtered
    assert len(pts_on) > 2000  # wall survives


def test_keyframe_schedule_current_frame_share():
    from ovo_tpu.slam.gaussian.mapper import keyframe_sampling_schedule

    sched = keyframe_sampling_schedule(4000, 5, seed=0, cur_frac=0.4)
    share = (sched == 4).mean()
    assert 0.3 < share < 0.5  # newest keyframe draws ~cur_frac of iters
    assert set(np.unique(sched)) <= {0, 1, 2, 3, 4}


def test_mapping_vis_dump(tmp_path):
    """mapping.vis_every dumps render-vs-gt panels under mapping_vis/
    (reference Logger.vis_mapping_iteration role)."""
    from ovo_tpu.slam.gaussian.backbone import WrapperGaussianSLAM

    bk = WrapperGaussianSLAM(
        {"dataset_name": "synthetic", "output_path": str(tmp_path),
         "mapping": {"iterations": 2, "max_seeds": 512, "vis_every": 1,
                     "n_gaussians_capacity": 1 << 12, "k_per_tile": 32,
                     "seed_depth_mult": 1.0},
         "tracking": {"gt_camera": True}}, K)
    H, W = IMG_HW
    depth = np.full((H, W), 2.0, np.float32)
    image = np.full((H, W, 3), 128, np.uint8)
    pose = np.eye(4, dtype=np.float32)
    bk.track_camera([0, image, depth, pose])
    bk.map([0, image, depth, pose], bk.get_c2w(0))
    assert (tmp_path / "mapping_vis" / "0000_color.png").exists()
    assert (tmp_path / "mapping_vis" / "0000_depth.png").exists()


def test_gaussian_ply_roundtrip(tmp_path):
    """save_gaussian_ply/load_gaussian_ply roundtrip the raw parameters in
    the reference's 3DGS vertex layout (sem_gaussian_model.py:59-158)."""
    from ovo_tpu.slam.gaussian.model import (load_gaussian_ply,
                                             save_gaussian_ply)

    rng = np.random.default_rng(3)
    state = init_gaussian_state(128)
    pts = rng.standard_normal((40, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (40, 3)).astype(np.float32)
    state = add_points(state, jnp.asarray(pts), jnp.asarray(cols),
                       jnp.ones(40, bool))
    state = state._replace(obj_ids=state.obj_ids.at[:40].set(
        jnp.asarray(rng.integers(-1, 5, 40), jnp.int32)))

    p = tmp_path / "map.ply"
    save_gaussian_ply(state, p)
    # header is reference-shaped: f4 props incl. normals, obj_0, ids
    head = p.read_bytes()[:800].decode("ascii", "ignore")
    assert "format binary_little_endian" in head
    for prop in ("f_dc_0", "scale_2", "rot_3", "obj_0", "ids"):
        assert f"property float {prop}" in head

    st2 = load_gaussian_ply(p, 256)
    assert n_valid(st2) == 40
    np.testing.assert_allclose(np.asarray(st2.xyz[:40]), pts, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(st2.obj_ids[:40]),
                                  np.asarray(state.obj_ids[:40]))
    np.testing.assert_allclose(np.asarray(st2.opacity_logit[:40]),
                               np.asarray(state.opacity_logit[:40]),
                               atol=1e-6)


def test_tracking_knob_plumbing():
    """Reference tracking keys (slam/gaussian_slam/*.yaml) reach the
    tracker: w_color_loss splits into color/depth weights (tracker.py:178),
    lrs/alpha/soft_alpha pass through, odometry_type maps onto the pose
    init."""
    from ovo_tpu.slam.gaussian.backbone import WrapperGaussianSLAM

    bk = WrapperGaussianSLAM(
        {"dataset_name": "replica",
         "mapping": {"iterations": 2, "n_gaussians_capacity": 1 << 10},
         "tracking": {"w_color_loss": 0.95, "cam_rot_lr": 1e-3,
                      "cam_trans_lr": 5e-3, "soft_alpha": False,
                      "alpha_thre": 0.9, "init_err_ratio": 5,
                      "odometry_type": "const_speed"}}, K)
    assert bk.track_color_w == 0.95
    assert abs(bk.track_depth_w - 0.05) < 1e-9
    assert bk.track_lr_q == 1e-3 and bk.track_lr_t == 5e-3
    assert bk.track_soft_alpha is False and bk.track_alpha_th == 0.9
    assert bk.init_err_ratio == 5.0

    bk2 = WrapperGaussianSLAM(
        {"dataset_name": "replica", "mapping": {},
         "tracking": {"odometry_type": "gt"}}, K)
    assert bk2.gt_camera  # reference odometry_type: gt


# -------------------------------------------------------------- backbone --
def test_gaussian_backbone_in_pipeline(tmp_path):
    from ovo_tpu.data.masks import CallableMaskSource, RecordedEmbedder
    from ovo_tpu.mapping.pipeline import OVOSemMap
    from synthetic_scene import (CLASSES, SyntheticWallDataset,
                                 class_embeddings, mask_label_fn,
                                 synthetic_mask_fn)

    config = {
        "dataset_name": "synthetic", "use_wandb": False, "debug": False,
        "slam": {"slam_module": "gaussian_slam", "save_estimated_cam": True},
        # seed_depth_mult 1.0: the reference's 1.005*depth seeding
        # (mapper.py:89) places every seed of a CONSTANT-depth wall behind
        # the association frustum far plane (= max depth, no slack), so the
        # flat synthetic scene must seed at true depth
        "mapping": {"map_every": 2, "iterations": 12, "max_seeds": 2048,
                    "n_gaussians_capacity": 1 << 15, "keyframe_window": 3,
                    "k_per_tile": 32, "seed_depth_mult": 1.0},
        "tracking": {"track_every": 1, "gt_camera": True},
        "data": {"scene_name": "wall0"}, "cam": {},
        "semantic": {
            "segment_every": 4, "match_distance_th": 0.1, "track_th": 30,
            "depth_filter": False, "log": False, "kf_queue_delay": 1,
            "capacity": {"n_instances": 64, "n_masks": 16},
            "clip": {"k_top_views": 10000, "fusion": "avg_pooling",
                     "clip_dim": 16},
        },
    }
    ds = SyntheticWallDataset(n_frames=8)
    embeds = class_embeddings(16)
    text_embeds = {c: embeds[i] for i, c in enumerate(CLASSES)}
    embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
    mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
    sem_map = OVOSemMap(config, tmp_path, mask_source=mask_source,
                        embedder=embedder, dataset=ds)
    sem_map.run()

    state = sem_map.slam_backbone.get_map()
    assert int(state.count) > 500
    ids = sem_map.ovo.active_ids()
    assert len(ids) >= 3
    # instance ids written back into the gaussian map
    obj = np.asarray(sem_map.slam_backbone.state.obj_ids)
    live = np.asarray(sem_map.slam_backbone.state.valid)
    assert (obj[live] >= 0).mean() > 0.3

    # checkpoint roundtrip with the gaussian key layout
    from ovo_tpu.utils import io as io_utils
    ckpt = io_utils.load_ckpt(tmp_path / "ovo_map.ckpt")
    assert "f_dc" in ckpt["map_params"]
    sem_map.slam_backbone.set_map_dict(ckpt["map_params"])
    assert n_valid(sem_map.slam_backbone.state) == int(state.count)


# ---------------------------------------------------------- densification --
def test_densify_clone_split_semantics():
    """Clone appends an exact copy of small high-gradient gaussians; split
    removes large ones and appends two samples with scales/1.6; low-gradient
    gaussians are untouched; obj_ids ride along (gaussian-splatting
    clone/split semantics, reference gaussian_model.py:323-409 machinery)."""
    import jax
    from ovo_tpu.slam.gaussian.model import densify_clone_split

    state = init_gaussian_state(32)
    pts = np.array([[0, 0, 2.0], [1, 0, 2.0], [0, 1, 2.0], [4, 4, 4.0]],
                   np.float32)
    cols = np.full((4, 3), 0.5, np.float32)
    state = add_points(state, jnp.asarray(pts), jnp.asarray(cols),
                       jnp.ones(4, bool))
    # gaussian 1 big (split), gaussian 2 small (clone), others quiet
    state = state._replace(
        scales_log=state.scales_log.at[1].set(np.log(2.0)).at[2].set(
            np.log(1e-3)),
        obj_ids=state.obj_ids.at[1].set(7).at[2].set(9))
    grad = jnp.zeros(32).at[1].set(1.0).at[2].set(1.0)
    out, appended = densify_clone_split(
        state, grad, jax.random.PRNGKey(0), jnp.asarray(0.5),
        jnp.asarray(0.01))
    assert n_valid(out) == 4 - 1 + 1 + 2  # split removes 1, adds 2; clone +1
    v = np.asarray(out.valid)
    # the split original's slot was freed (possibly reused by an append)
    assert not (v[1] and np.allclose(np.asarray(out.xyz[1]), pts[1])
                and int(out.ids[1]) == int(state.ids[1]))
    app = np.asarray(appended)
    assert app.sum() >= 3
    # clone: an appended row identical to gaussian 2, obj_id preserved
    new_rows = np.where(v & app)[0]
    xyz = np.asarray(out.xyz)
    clone_rows = [r for r in new_rows
                  if np.allclose(xyz[r], pts[2], atol=1e-6)]
    assert len(clone_rows) == 1
    assert int(out.obj_ids[clone_rows[0]]) == 9
    # split samples: near gaussian 1, scales reduced by 1.6, obj_id kept
    split_rows = [r for r in new_rows if r not in clone_rows]
    assert len(split_rows) == 2
    for r in split_rows:
        assert np.linalg.norm(xyz[r] - pts[1]) < 8.0  # within a few sigma
        np.testing.assert_allclose(np.asarray(out.scales_log[r]),
                                   np.log(2.0) - np.log(1.6), atol=1e-6)
        assert int(out.obj_ids[r]) == 7
    # untouched gaussians keep everything
    np.testing.assert_allclose(xyz[0], pts[0])
    np.testing.assert_allclose(xyz[3], pts[3])


def test_densify_improves_reconstruction():
    """With a deliberately sparse seed budget, the densify path must trigger
    (gaussian count grows) and improve PSNR over the no-densify run."""
    rng = np.random.default_rng(5)
    H, W = IMG_HW
    depth = np.full((H, W), 2.0, np.float32)
    # high-frequency texture: thin structure the sparse seeds blur over
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    image = np.stack([0.5 + 0.45 * np.sin(u * 0.9),
                      0.5 + 0.45 * np.cos(v * 0.7),
                      np.full((H, W), 0.5)], -1).astype(np.float32)
    w2c = jnp.asarray(np.eye(4, dtype=np.float32))
    kf_i = jnp.asarray(image[None])
    kf_d = jnp.asarray(depth[None])
    kf_w = jnp.asarray(np.eye(4, dtype=np.float32)[None])

    def run(densify_th):
        cfg = MapperConfig(iters=120, max_seeds=128, k_per_tile=32,
                           prune_opacity_th=0.0, densify_grad_th=densify_th,
                           densify_percent_dense=0.05)
        state = init_gaussian_state(4096)
        state = map_keyframe(state, jnp.asarray(image), jnp.asarray(depth),
                             w2c, jnp.asarray(K), kf_i, kf_d, kf_w,
                             is_new_submap=True, seed=3, img_hw=IMG_HW,
                             cfg=cfg)
        out = render_gaussians(state.xyz, state.scales(), state.quats,
                               state.opacity(), state.colors(), state.valid,
                               w2c, jnp.asarray(K), img_hw=IMG_HW,
                               k_per_tile=32)
        mse = float(((np.asarray(out.color) - image) ** 2).mean())
        return n_valid(state), -10.0 * np.log10(max(mse, 1e-12))

    n_off, psnr_off = run(0.0)
    n_on, psnr_on = run(3e-4)
    assert n_on > n_off, "densify never triggered"
    assert psnr_on > psnr_off, (psnr_on, psnr_off)

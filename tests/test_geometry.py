"""Geometry ops vs independent torch/numpy oracles (reference semantics)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from ovo_tpu import geometry as geo


def make_cam(h=48, w=64, fx=60.0, fy=60.0):
    K = np.array([[fx, 0, w / 2 - 0.5], [0, fy, h / 2 - 0.5], [0, 0, 1]],
                 dtype=np.float32)
    return K, h, w


def random_pose(rng):
    # random small rotation + translation
    a, b, c = rng.uniform(-0.3, 0.3, 3)

    def rot(axis, t):
        c_, s_ = np.cos(t), np.sin(t)
        m = np.eye(3)
        i, j = [(1, 2), (0, 2), (0, 1)][axis]
        m[i, i] = c_
        m[j, j] = c_
        m[i, j] = -s_
        m[j, i] = s_
        return m

    R = rot(0, a) @ rot(1, b) @ rot(2, c)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = rng.uniform(-1, 1, 3)
    return T


def test_project_points_matches_manual(rng):
    K, h, w = make_cam()
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 3.0, 100)
    uv, z = geo.project_points(jnp.asarray(pts), jnp.asarray(K))
    u_ref = np.round(K[0, 0] * pts[:, 0] / pts[:, 2] + K[0, 2]).astype(np.int32)
    v_ref = np.round(K[1, 1] * pts[:, 1] / pts[:, 2] + K[1, 2]).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(uv[:, 0]), u_ref)
    np.testing.assert_array_equal(np.asarray(uv[:, 1]), v_ref)
    np.testing.assert_allclose(np.asarray(z), pts[:, 2], rtol=1e-6)


def test_frustum_corners_roundtrip(rng):
    K, h, w = make_cam()
    depth = rng.uniform(0.5, 4.0, (h, w)).astype(np.float32)
    depth[0, 0] = 0.0  # zero depths excluded from extremes
    c2w = random_pose(rng)
    corners = np.asarray(geo.compute_camera_frustum_corners(
        jnp.asarray(depth), jnp.asarray(c2w), jnp.asarray(K)))
    # reproject corners with w2c: should land at image corners & depth extremes
    w2c = np.linalg.inv(c2w)
    cam = corners @ w2c[:3, :3].T + w2c[:3, 3]
    valid = depth[depth > 0]
    zs = sorted(set(np.round(cam[:, 2], 4)))
    assert np.isclose(min(zs), valid.min(), atol=5e-3)
    assert np.isclose(max(zs), valid.max(), atol=5e-3)


def test_points_in_frustum_vs_projection(rng):
    K, h, w = make_cam()
    depth = np.full((h, w), 3.0, dtype=np.float32)
    depth[0, 0] = 1.0  # min depth 1
    c2w = random_pose(rng)
    corners = geo.compute_camera_frustum_corners(
        jnp.asarray(depth), jnp.asarray(c2w), jnp.asarray(K))

    # points sampled uniformly in a box around the camera
    pts = rng.uniform(-6, 6, (5000, 3)).astype(np.float32)
    pts_w = pts @ c2w[:3, :3].T + c2w[:3, 3]
    mask = np.asarray(geo.points_in_frustum(jnp.asarray(pts_w), corners))

    # oracle: a point is in the frustum iff its camera-space projection lies
    # within the image and depth within [min,max] (convex hull of corners)
    z = pts[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = K[0, 0] * pts[:, 0] / z + K[0, 2]
        v = K[1, 1] * pts[:, 1] / z + K[1, 2]
    oracle = (z >= 1.0) & (z <= 3.0) & (u >= -0.5) & (u <= w - 0.5) & \
             (v >= -0.5) & (v <= h - 0.5)
    # allow tiny boundary discrepancies (<=1% of points)
    agree = (mask == oracle).mean()
    assert agree > 0.99, f"frustum agreement {agree}"


def test_match_points_to_depth_semantics(rng):
    K, h, w = make_cam()
    c2w = random_pose(rng)
    w2c = np.linalg.inv(c2w)
    depth = rng.uniform(1.0, 3.0, (h, w)).astype(np.float32)
    depth[5, :] = 0.0  # invalid depth row: never matches

    # build points by unprojecting some pixels exactly -> should match
    vv, uu = np.meshgrid(np.arange(0, h, 3), np.arange(0, w, 3), indexing="ij")
    uu, vv = uu.ravel(), vv.ravel()
    z = depth[vv, uu]
    x = (uu - K[0, 2]) * z / K[0, 0]
    y = (vv - K[1, 2]) * z / K[1, 1]
    cam = np.stack([x, y, z], 1).astype(np.float32)
    world = cam @ c2w[:3, :3].T + c2w[:3, 3]
    # plus far-away points -> never match
    junk = rng.uniform(50, 60, (40, 3)).astype(np.float32)
    pts = np.concatenate([world, junk]).astype(np.float32)

    matched, uv = geo.match_points_to_depth(
        jnp.asarray(depth), jnp.asarray(w2c), jnp.asarray(pts),
        jnp.asarray(K), th_dist=0.05)
    matched = np.asarray(matched)
    uv = np.asarray(uv)

    n_exact = len(uu)
    expect = z > 0
    np.testing.assert_array_equal(matched[:n_exact], expect)
    assert not matched[n_exact:].any()
    np.testing.assert_array_equal(uv[:n_exact][expect, 0], uu[expect])
    np.testing.assert_array_equal(uv[:n_exact][expect, 1], vv[expect])


def test_depth_filter_matches_reference_blur(rng):
    # oracle: scipy separable gaussian with mirror padding == torchvision's
    # gaussian_blur (reflect pad, truncated normalized kernel)
    from scipy.ndimage import correlate1d

    depth = rng.uniform(0.5, 4.0, (32, 40)).astype(np.float32)
    depth[10:12, 20:25] += 2.0  # sharp discontinuity
    ours = np.asarray(geo.depth_filter(jnp.asarray(depth)))
    x = np.linspace(-3, 3, 7)
    k = np.exp(-0.5 * (x / 2.5) ** 2)
    k = (k / k.sum()).astype(np.float32)
    low = correlate1d(correlate1d(depth, k, axis=0, mode="mirror"),
                      k, axis=1, mode="mirror")
    high = np.abs(depth - low)
    ref = np.where(high > 0.05, -1.0, depth)
    # identical mask decisions away from the threshold boundary (float
    # rounding can flip pixels with |high - th| ~ 1e-5)
    decisive = np.abs(high - 0.05) > 1e-4
    np.testing.assert_array_equal((ours == -1.0)[decisive], (ref == -1.0)[decisive])
    same = (ours == -1.0) == (ref == -1.0)
    np.testing.assert_allclose(ours[same], ref[same], atol=1e-4)


def test_unproject_roundtrip(rng):
    K, h, w = make_cam()
    c2w = random_pose(rng)
    depth = rng.uniform(1.0, 3.0, (h, w)).astype(np.float32)
    pts = np.asarray(geo.unproject_depth(
        jnp.asarray(depth), jnp.asarray(K), jnp.asarray(c2w)))
    matched, uv = geo.match_points_to_depth(
        jnp.asarray(depth), jnp.asarray(np.linalg.inv(c2w)),
        jnp.asarray(pts), jnp.asarray(K), th_dist=1e-3)
    assert np.asarray(matched).all()


def test_max_pool_erode_matches_torch(rng):
    mask = rng.random((20, 24)) > 0.5
    ours = np.asarray(geo.max_pool_erode(jnp.asarray(mask), 3))
    pool = torch.nn.MaxPool2d(kernel_size=3, stride=1, padding=1)
    ref = ~(pool((~torch.from_numpy(mask)[None]).float())[0].bool()).numpy()
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("k", [1, 3, 5])
@pytest.mark.parametrize("s", [2, 3])
@pytest.mark.parametrize("hw", [(20, 24), (21, 25)])
def test_max_pool_erode_stride_equals_subsample(rng, k, s, hw):
    """Fused-stride erode == stride-1 erode followed by [::s, ::s]
    (the association insert path relies on this exactly)."""
    mask = rng.random(hw) > 0.5
    ref = np.asarray(geo.max_pool_erode(jnp.asarray(mask), k))[::s, ::s]
    got = np.asarray(geo.max_pool_erode(jnp.asarray(mask), k, stride=s))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("s", [1, 2, 3])
@pytest.mark.parametrize("hw", [(20, 24), (21, 25), (20, 25)])
def test_subsample2d_equals_strided_slice(rng, s, hw):
    x = rng.standard_normal(hw + (3,)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(geo.subsample2d(jnp.asarray(x), s)), x[::s, ::s])
    m = rng.random(hw) > 0.5
    np.testing.assert_array_equal(
        np.asarray(geo.subsample2d(jnp.asarray(m), s)), m[::s, ::s])


@pytest.mark.parametrize("k", [1, 3, 5])
def test_max_pool_erode_identity_when_k1(rng, k):
    mask = rng.random((8, 8)) > 0.3
    out = np.asarray(geo.max_pool_erode(jnp.asarray(mask), k))
    if k == 1:
        np.testing.assert_array_equal(out, mask)
    else:
        assert (~out | mask).all()  # erosion only removes True pixels

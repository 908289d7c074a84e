"""Vanilla mapper device ops vs a sequential numpy oracle
(vanilla_mapper.py:46-85 semantics)."""
import numpy as np
import jax.numpy as jnp

from ovo_tpu.mapping.map_state import (MapState, from_map_dict, init_map_state,
                                       map_dict, map_insert_frame)

H, W = 32, 48


def make_cam():
    return np.array([[40.0, 0, W / 2 - 0.5], [0, 40.0, H / 2 - 0.5], [0, 0, 1]],
                    dtype=np.float32)


def test_first_frame_appends_all_valid_depth(rng):
    K = make_cam()
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    depth[::7, ::5] = 0.0  # some invalid pixels
    image = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    c2w = np.eye(4, dtype=np.float32)

    state = init_map_state(4096)
    state = map_insert_frame(state, jnp.asarray(image), jnp.asarray(depth),
                             jnp.asarray(c2w), jnp.asarray(K),
                             k_pooling=3, downscale=2)
    # oracle: downscaled valid-depth pixels, row-major
    mask = (depth > 0)[::2, ::2]
    n_expect = int(mask.sum())
    assert int(state.count) == n_expect
    assert int(state.next_point_id) == n_expect

    d = depth[::2, ::2]
    vv, uu = np.meshgrid(np.arange(H)[::2], np.arange(W)[::2], indexing="ij")
    x = (uu - K[0, 2]) * d / K[0, 0]
    y = (vv - K[1, 2]) * d / K[1, 1]
    pts_ref = np.stack([x, y, d], -1)[mask]
    np.testing.assert_allclose(np.asarray(state.points[:n_expect]), pts_ref,
                               atol=1e-5)
    cols_ref = image[::2, ::2][mask]
    np.testing.assert_array_equal(np.asarray(state.colors[:n_expect]), cols_ref)
    assert (np.asarray(state.obj_ids[:n_expect]) == -1).all()
    np.testing.assert_array_equal(np.asarray(state.point_ids[:n_expect]),
                                  np.arange(n_expect))


def test_second_frame_dedups_matched_pixels(rng):
    K = make_cam()
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    image = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    c2w = np.eye(4, dtype=np.float32)

    state = init_map_state(8192)
    args = (jnp.asarray(image), jnp.asarray(depth), jnp.asarray(c2w),
            jnp.asarray(K))
    state = map_insert_frame(state, *args, k_pooling=3, downscale=2)
    n1 = int(state.count)
    # identical second frame: interior pixels all re-match; only border
    # pixels (culled by the reference's quirky frustum planes, so never
    # matched -- same behavior as the reference) may re-append
    state = map_insert_frame(state, *args, k_pooling=3, downscale=2)
    added = int(state.count) - n1
    assert added <= 0.05 * n1, f"added {added} of {n1}"


def test_new_region_appends_only_new(rng):
    K = make_cam()
    depth = rng.uniform(1.5, 2.5, (H, W)).astype(np.float32)
    image = np.zeros((H, W, 3), np.uint8)
    c2w = np.eye(4, dtype=np.float32)
    state = init_map_state(8192)
    state = map_insert_frame(state, jnp.asarray(image), jnp.asarray(depth),
                             jnp.asarray(c2w), jnp.asarray(K),
                             k_pooling=1, downscale=1)
    n1 = int(state.count)
    # shift the right half of the scene far away -> those pixels are "new"
    depth2 = depth.copy()
    depth2[:, W // 2:] += 5.0
    state = map_insert_frame(state, jnp.asarray(image), jnp.asarray(depth2),
                             jnp.asarray(c2w), jnp.asarray(K),
                             k_pooling=1, downscale=1)
    n2 = int(state.count)
    expected = H * (W - W // 2)
    added = n2 - n1
    # new right half appended; a few unmatched border pixels on the left may
    # also re-append (reference frustum-plane border behavior)
    assert expected <= added <= expected + 0.03 * n1, (added, expected)


def test_capacity_overflow_truncates(rng):
    K = make_cam()
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    image = np.zeros((H, W, 3), np.uint8)
    state = init_map_state(100)  # too small
    state = map_insert_frame(state, jnp.asarray(image), jnp.asarray(depth),
                             jnp.asarray(np.eye(4, dtype=np.float32)),
                             jnp.asarray(K), k_pooling=1, downscale=1)
    assert int(state.count) == 100
    assert int(state.next_point_id) == H * W  # ids keep advancing


def test_map_dict_roundtrip(rng):
    K = make_cam()
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    image = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    state = init_map_state(4096)
    state = map_insert_frame(state, jnp.asarray(image), jnp.asarray(depth),
                             jnp.asarray(np.eye(4, dtype=np.float32)),
                             jnp.asarray(K), k_pooling=3, downscale=2)
    d = map_dict(state)
    assert set(d) == {"xyz", "obj_ids", "ids", "max_id", "color"}
    state2 = from_map_dict(d, capacity=4096)
    assert int(state2.count) == int(state.count)
    np.testing.assert_allclose(np.asarray(state2.points[:int(state.count)]),
                               d["xyz"], atol=0)


def test_bucketed_growth_preserves_map(rng):
    """grow_map_state + VanillaMapper bucketing: buffers double on demand
    and content/ids survive growth (SURVEY hard-part 2)."""
    import jax.numpy as jnp

    from ovo_tpu.mapping.map_state import grow_map_state, init_map_state
    from ovo_tpu.slam.vanilla import VanillaMapper

    state = init_map_state(64)
    state = state._replace(
        points=state.points.at[:10].set(1.5),
        point_ids=state.point_ids.at[:10].set(jnp.arange(10)),
        count=jnp.asarray(10, jnp.int32),
        next_point_id=jnp.asarray(10, jnp.int32))
    grown = grow_map_state(state, 256)
    assert grown.capacity == 256
    assert int(grown.count) == 10
    np.testing.assert_allclose(np.asarray(grown.points[:10]), 1.5)
    assert int(grown.point_ids[10]) == -1
    # no-op shrink
    assert grow_map_state(grown, 64).capacity == 256

    H, W = 32, 48
    cfg = {"mapping": {"n_points_capacity": 1 << 13, "k_pooling": 1,
                       "downscale_res": 1, "initial_capacity": 1 << 9}}
    K = np.array([[40.0, 0, 23.5], [0, 40.0, 15.5], [0, 0, 1]], np.float32)
    m = VanillaMapper(cfg, K)
    assert m.state.capacity == 1 << 9
    c2w = np.eye(4, dtype=np.float32)
    for i in range(4):
        c2w2 = c2w.copy()
        c2w2[0, 3] = i * 2.0  # disjoint views -> all points new
        depth = rng.uniform(1.0, 2.0, (H, W)).astype(np.float32)
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        m.track_camera([i, img, depth, c2w2])
        m.map([i, img, depth, c2w2], c2w2)
    assert m.state.capacity > (1 << 9)          # grew
    assert m.state.capacity <= (1 << 13)        # capped
    n = int(m.state.count)
    assert n > 3 * H * W                        # nothing dropped
    ids = np.asarray(m.state.point_ids[:n])
    assert len(np.unique(ids)) == n             # stable unique ids

    # checkpoint roundtrip grows the restore bucket as needed
    d = m.get_map_dict()
    m2 = VanillaMapper(cfg, K)
    m2.set_map_dict(d)
    assert int(m2.state.count) == n

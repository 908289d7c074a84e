"""Parity tests: vectorized association program vs the sequential oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from ovo_tpu.mapping import association, instances as inst_mod
from ovo_tpu.mapping.instances import init_instance_store
from ovo_tpu.mapping.map_state import MapState, init_map_state

from oracle_reference import (OracleTracker, oracle_frustum_mask,
                              oracle_match_points)

H, W = 40, 56
M_MAX = 16
K_CAP = 64
FX = 50.0


def make_cam():
    return np.array([[FX, 0, W / 2 - 0.5], [0, FX, H / 2 - 0.5], [0, 0, 1]],
                    dtype=np.float32)


def synthetic_frame(rng, n_masks=6):
    """A frame where masks are rectangles in the image and points unproject
    exactly from the depth map (so geometry matching is exact)."""
    K = make_cam()
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    seg = -np.ones((H, W), np.int32)
    bmaps = np.zeros((M_MAX, H, W), bool)
    # tile rectangles
    cols = np.array_split(np.arange(W), 3)
    rows = np.array_split(np.arange(H), 2)
    i = 0
    for rr in rows:
        for cc in cols:
            if i >= n_masks:
                break
            seg[np.ix_(rr, cc)] = i
            bmaps[i][np.ix_(rr, cc)] = True
            i += 1
    valid = np.zeros(M_MAX, bool)
    valid[:n_masks] = True
    return K, depth, seg, bmaps, valid


def points_from_depth(depth, K, c2w, stride=1):
    # skip border pixels: they unproject exactly ONTO frustum boundary
    # planes, where f32 (device) vs f64 (oracle) rounding flips the verdict
    vv, uu = np.meshgrid(np.arange(1, H - 1, stride),
                         np.arange(1, W - 1, stride), indexing="ij")
    uu, vv = uu.ravel(), vv.ravel()
    z = depth[vv, uu]
    x = (uu - K[0, 2]) * z / K[0, 0]
    y = (vv - K[1, 2]) * z / K[1, 1]
    cam = np.stack([x, y, z], 1)
    return (cam @ c2w[:3, :3].T + c2w[:3, 3]).astype(np.float32), uu, vv


def run_both(rng, obj_init, track_th=50, kf_id=0, n_masks=6,
             store=None, oracle=None, map_capacity=4096):
    K, depth, seg, bmaps, valid = synthetic_frame(rng, n_masks)
    c2w = np.eye(4, dtype=np.float32)
    pts, uu, vv = points_from_depth(depth, K, c2w)
    n = pts.shape[0]
    obj_init = obj_init[:n]

    ms = init_map_state(map_capacity)
    ms = MapState(
        points=ms.points.at[:n].set(pts),
        point_ids=ms.point_ids.at[:n].set(np.arange(n, dtype=np.int32)),
        obj_ids=ms.obj_ids.at[:n].set(obj_init.astype(np.int32)),
        colors=ms.colors,
        count=jnp.asarray(n, jnp.int32),
        next_point_id=jnp.asarray(n, jnp.int32),
    )
    if store is None:
        store = init_instance_store(K_CAP, clip_dim=8)
    if oracle is None:
        oracle = OracleTracker(track_th=track_th)
        oracle.next_id = int(store.next_id)

    new_ms, new_store, out = association.associate_keyframe(
        ms, store, jnp.asarray(seg), jnp.asarray(bmaps), jnp.asarray(valid),
        jnp.asarray(depth), jnp.asarray(c2w), jnp.asarray(K),
        jnp.asarray(kf_id, jnp.int32),
        match_distance_th=0.05, track_th=track_th, use_depth_filter=False,
        unbounded_top_k=True)

    # oracle path
    frustum = oracle_frustum_mask(depth, c2w, K, pts)
    ok, uc, vc = oracle_match_points(depth, np.linalg.inv(c2w), pts, K, 0.05,
                                     frustum=frustum)
    matched_idx = np.where(ok)[0]
    matched_seg = seg[vc[matched_idx], uc[matched_idx]]
    inb = matched_seg >= 0
    oracle_obj, info = oracle.track(obj_init.copy(), matched_idx[inb],
                                    matched_seg[inb], seg, kf_id)
    o_ins, o_maps, o_areas = oracle.fuse(bmaps, info, kf_id)

    return (new_ms, new_store, out), (oracle, oracle_obj, o_ins, o_maps,
                                      o_areas), n


def test_first_frame_mints_instances(rng):
    obj0 = -np.ones(H * W, np.int64)
    (ms, store, out), (oracle, o_obj, o_ins, o_maps, o_areas), n = \
        run_both(rng, obj0)
    got_ins = np.asarray(out.ins_ids)
    keep = np.asarray(out.keep)
    assert sorted(got_ins[keep].tolist()) == sorted(o_ins)
    assert int(out.n_new) == oracle.next_id
    # point labels identical
    np.testing.assert_array_equal(np.asarray(ms.obj_ids[:n]), o_obj)
    # areas per kept slot match oracle's
    ours = {int(i): int(a) for i, a in zip(got_ins[keep], np.asarray(out.areas)[keep])}
    theirs = dict(zip(o_ins, o_areas))
    assert ours == theirs


def test_second_frame_tracks_existing(rng):
    obj0 = -np.ones(H * W, np.int64)
    (ms, store, out), (oracle, o_obj, *_), n = run_both(rng, obj0)
    # second frame: same layout, points pre-assigned from frame 0
    obj1 = np.asarray(ms.obj_ids[:n]).astype(np.int64)
    (ms2, store2, out2), (oracle2, o_obj2, o_ins2, o_maps2, o_areas2), _ = \
        run_both(rng, obj1, kf_id=1, store=store, oracle=oracle)
    keep = np.asarray(out2.keep)
    got = np.asarray(out2.ins_ids)[keep]
    assert sorted(got.tolist()) == sorted(o_ins2)
    assert int(out2.n_new) == 0
    np.testing.assert_array_equal(np.asarray(ms2.obj_ids[:n]), o_obj2)


def test_mixed_assigned_majority_vote(rng):
    """Pre-assign points with competing ids; the mask majority (with
    torch.mode's lowest-id tie-break) must win in both implementations."""
    obj0 = -np.ones(H * W, np.int64)
    # seed two instances into the store id space first
    (ms, store, out), (oracle, o_obj, *_), n = run_both(rng, obj0)
    obj1 = np.asarray(ms.obj_ids[:n]).astype(np.int64)
    # corrupt: swap labels of a random half of assigned points between two ids
    ids = np.unique(obj1[obj1 >= 0])
    if len(ids) >= 2:
        a, b = ids[0], ids[1]
        sel = rng.random(obj1.shape) < 0.5
        obj1 = np.where((obj1 == a) & sel, b, obj1)
    (ms2, store2, out2), (oracle2, o_obj2, o_ins2, o_maps2, o_areas2), _ = \
        run_both(rng, obj1, kf_id=1, store=store, oracle=oracle)
    np.testing.assert_array_equal(np.asarray(ms2.obj_ids[:n]), o_obj2)
    keep = np.asarray(out2.keep)
    assert sorted(np.asarray(out2.ins_ids)[keep].tolist()) == sorted(o_ins2)


def test_fused_masks_match_oracle(rng):
    """Two masks pre-labelled with one instance id -> OR-fusion into one slot."""
    obj0 = -np.ones(H * W, np.int64)
    (ms, store, out), (oracle, o_obj, *_), n = run_both(rng, obj0)
    obj1 = np.asarray(ms.obj_ids[:n]).astype(np.int64)
    ids = np.unique(obj1[obj1 >= 0])
    a, b = ids[0], ids[1]
    obj1[obj1 == b] = a  # force two rectangles to share an instance
    (ms2, store2, out2), (oracle2, o_obj2, o_ins2, o_maps2, o_areas2), _ = \
        run_both(rng, obj1, kf_id=1, store=store, oracle=oracle)
    keep = np.asarray(out2.keep)
    got_ins = np.asarray(out2.ins_ids)[keep]
    assert sorted(got_ins.tolist()) == sorted(o_ins2)
    # compare fused maps slotwise by instance id
    fused = np.asarray(out2.fused_maps)[keep]
    for ins, omap in zip(o_ins2, o_maps2):
        ours = fused[got_ins.tolist().index(ins)]
        np.testing.assert_array_equal(ours, omap)
    ours_areas = {int(i): int(ar) for i, ar in
                  zip(got_ins, np.asarray(out2.areas)[keep])}
    assert ours_areas == dict(zip(o_ins2, o_areas2))


def test_track_th_gates_small_masks(rng):
    obj0 = -np.ones(H * W, np.int64)
    # huge track_th -> nothing minted
    (ms, store, out), (oracle, *_), n = run_both(rng, obj0, track_th=10 ** 6)
    assert int(out.n_new) == 0
    assert not np.asarray(out.keep).any()
    assert (np.asarray(ms.obj_ids[:n]) == -1).all()


def test_capacity_overflow_drops_masks(rng):
    obj0 = -np.ones(H * W, np.int64)
    store = init_instance_store(3, clip_dim=8)  # only 3 instance slots
    K, depth, seg, bmaps, valid = synthetic_frame(rng, 6)
    c2w = np.eye(4, dtype=np.float32)
    pts, _, _ = points_from_depth(depth, K, c2w)
    n = pts.shape[0]
    ms = init_map_state(4096)
    ms = MapState(ms.points.at[:n].set(pts),
                  ms.point_ids.at[:n].set(np.arange(n, dtype=np.int32)),
                  ms.obj_ids.at[:n].set(obj0.astype(np.int32)[:n]),
                  ms.colors, jnp.asarray(n, jnp.int32), jnp.asarray(n, jnp.int32))
    _, store2, out = association.associate_keyframe(
        ms, store, jnp.asarray(seg), jnp.asarray(bmaps), jnp.asarray(valid),
        jnp.asarray(depth), jnp.asarray(c2w), jnp.asarray(K),
        jnp.asarray(0, jnp.int32), match_distance_th=0.05, track_th=50,
        use_depth_filter=False, unbounded_top_k=True)
    assert int(out.n_new) == 3
    assert int(out.n_dropped_masks) == 3
    assert int(store2.next_id) == 3


@pytest.mark.parametrize("downscale,k_pooling", [(1, 1), (2, 3)])
def test_fused_associate_insert_matches_two_step(rng, downscale, k_pooling):
    """associate_and_insert_keyframe == map_insert_frame then
    associate_keyframe, bit for bit -- the ONLINE PIPELINE's ordering
    (ovomapping.py:149-164: map first, so a keyframe's own fresh points
    participate in its association votes and get instance ids). This pins
    the fused program bench.py times to the exact shipped semantics."""
    import jax.numpy as jnp

    from ovo_tpu.mapping import association
    from ovo_tpu.mapping.instances import init_instance_store
    from ovo_tpu.mapping.map_state import init_map_state, map_insert_frame

    H, W = 48, 64
    N = 1 << 14
    M, Kcap = 8, 32
    K = jnp.asarray(np.array([[50.0, 0, 31.5], [0, 50.0, 23.5], [0, 0, 1]],
                             np.float32))
    c2w0 = jnp.asarray(np.eye(4, dtype=np.float32))
    # second frame from a shifted+rotated pose so plenty of NEW points
    # insert (dedup misses) and land inside this frame's masks: the
    # self-vote path must carry real traffic, not just zeros
    ang = 0.03
    c2w1 = np.eye(4, dtype=np.float32)
    c2w1[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)],
                             [0, 1, 0],
                             [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    c2w1[0, 3] = 0.08
    c2w1 = jnp.asarray(c2w1)
    # smooth depth: the depth filter passes it, so the fresh points'
    # |z - filtered| matches actually fire (random depth would zero the
    # self-vote traffic and make the activity assertion below vacuous)
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    depth0 = jnp.asarray(2.0 + 0.4 * np.sin(uu / 19.0) + 0.3 * vv / H)
    depth1 = jnp.asarray(2.1 + 0.4 * np.sin(uu / 17.0) + 0.25 * vv / H)
    img = jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))

    ins_kw = dict(k_pooling=k_pooling, downscale=downscale, match_th=0.03)

    def seeded_state():
        st = init_map_state(N)
        return map_insert_frame(st, img, depth0, c2w0, K, **ins_kw)

    seg = jnp.asarray(rng.integers(-1, M, (H, W)).astype(np.int32))
    bmaps = jnp.asarray(rng.random((M, H, W)) > 0.7)
    valid = jnp.ones(M, bool)
    kf = jnp.asarray(3, jnp.int32)
    kw = dict(match_distance_th=0.05, track_th=20, use_depth_filter=True,
              unbounded_top_k=True)

    # two-step shipped-pipeline order: map() FIRST, then associate
    s1 = map_insert_frame(seeded_state(), img, depth1, c2w1, K, **ins_kw)
    s1, st1, m1 = association.associate_keyframe(
        s1, init_instance_store(Kcap, 16), seg, bmaps, valid,
        depth1, c2w1, K, kf, **kw)

    s2, st2, m2 = association.associate_and_insert_keyframe(
        seeded_state(), init_instance_store(Kcap, 16), seg, bmaps, valid,
        img, depth1, c2w1, K, kf, k_pooling=k_pooling, downscale=downscale,
        insert_match_th=0.03, **kw)

    np.testing.assert_array_equal(np.asarray(m1.ins_ids), np.asarray(m2.ins_ids))
    np.testing.assert_array_equal(np.asarray(m1.keep), np.asarray(m2.keep))
    np.testing.assert_array_equal(np.asarray(m1.fused_maps),
                                  np.asarray(m2.fused_maps))
    assert int(m1.n_matched) == int(m2.n_matched)
    assert int(m1.n_new) == int(m2.n_new)
    assert int(s1.count) == int(s2.count)
    np.testing.assert_array_equal(np.asarray(s1.obj_ids), np.asarray(s2.obj_ids))
    np.testing.assert_array_equal(np.asarray(s1.point_ids),
                                  np.asarray(s2.point_ids))
    n = int(s1.count)
    np.testing.assert_allclose(np.asarray(s1.points[:n]),
                               np.asarray(s2.points[:n]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(st1.top_kf),
                                  np.asarray(st2.top_kf))
    np.testing.assert_array_equal(np.asarray(st1.top_area),
                                  np.asarray(st2.top_area))
    # the self-vote path must have been active: fresh frame-1 points were
    # inserted AND some of them received instance ids at association time
    n0 = int(seeded_state().count)
    appended_objs = np.asarray(s2.obj_ids[n0:n])
    assert appended_objs.size > 0
    assert (appended_objs >= 0).any()


@pytest.mark.parametrize("fused", [False, True])
def test_active_rows_bucket_is_bit_exact(rng, fused):
    """active_rows (the occupied-bucket bound, PERF.md 6p) must reproduce
    the full-capacity program bit-for-bit whenever active_rows >= count --
    including the untouched tail of obj_ids beyond the bucket."""
    import jax.numpy as jnp

    from ovo_tpu.mapping import association
    from ovo_tpu.mapping.instances import init_instance_store
    from ovo_tpu.mapping.map_state import init_map_state, map_insert_frame

    H, W = 48, 64
    N = 1 << 14                       # capacity
    AR = 1 << 12                      # bucket: count (3072) < 4096 < N
    M, Kcap = 8, 32
    K = jnp.asarray(np.array([[50.0, 0, 31.5], [0, 50.0, 23.5], [0, 0, 1]],
                             np.float32))
    c2w = jnp.asarray(np.eye(4, dtype=np.float32))
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    depth = jnp.asarray(2.0 + 0.4 * np.sin(uu / 19.0) + 0.3 * vv / H)
    img = jnp.asarray((rng.random((H, W, 3)) * 255).astype(np.uint8))
    seg = jnp.asarray(rng.integers(-1, M, (H, W)).astype(np.int32))
    bmaps = jnp.asarray(rng.random((M, H, W)) > 0.7)
    valid = jnp.ones(M, bool)
    kf = jnp.asarray(3, jnp.int32)
    kw = dict(match_distance_th=0.05, track_th=20, use_depth_filter=True,
              unbounded_top_k=True)

    def seeded():
        st = init_map_state(N)
        return map_insert_frame(st, img, depth, c2w, K, downscale=1,
                                match_th=0.03)

    assert int(seeded().count) <= AR

    if fused:
        def run(ar):
            return association.associate_and_insert_keyframe(
                seeded(), init_instance_store(Kcap, 16), seg, bmaps, valid,
                img, depth, c2w, K, kf, downscale=1, insert_match_th=0.03,
                active_rows=ar, **kw)
    else:
        def run(ar):
            return association.associate_keyframe(
                seeded(), init_instance_store(Kcap, 16), seg, bmaps, valid,
                depth, c2w, K, kf, active_rows=ar, **kw)

    s_full, st_full, m_full = run(None)
    s_b, st_b, m_b = run(AR)

    np.testing.assert_array_equal(np.asarray(m_full.ins_ids),
                                  np.asarray(m_b.ins_ids))
    np.testing.assert_array_equal(np.asarray(m_full.keep),
                                  np.asarray(m_b.keep))
    np.testing.assert_array_equal(np.asarray(m_full.fused_maps),
                                  np.asarray(m_b.fused_maps))
    assert int(m_full.n_matched) == int(m_b.n_matched)
    assert int(m_full.n_new) == int(m_b.n_new)
    assert int(s_full.count) == int(s_b.count)
    np.testing.assert_array_equal(np.asarray(s_full.obj_ids),
                                  np.asarray(s_b.obj_ids))
    np.testing.assert_array_equal(np.asarray(st_full.centroid_sum),
                                  np.asarray(st_b.centroid_sum)) \
        if hasattr(st_full, "centroid_sum") else None


def test_fused_insert_accepts_presubsampled_colors(rng):
    """Passing ``image`` already sliced to the insert grid (host-side
    image[::ds, ::ds], what bench.py/production H2D staging does to skip
    the on-device u8 relayout chain, PERF.md 6w) is bit-identical to
    passing the full-resolution image."""
    import jax.numpy as jnp

    from ovo_tpu.mapping import association
    from ovo_tpu.mapping.instances import init_instance_store
    from ovo_tpu.mapping.map_state import init_map_state, map_insert_frame

    H, W, N, M, Kcap, ds = 48, 64, 1 << 14, 8, 32, 2
    K = jnp.asarray(np.array([[50.0, 0, 31.5], [0, 50.0, 23.5], [0, 0, 1]],
                             np.float32))
    c2w = jnp.asarray(np.eye(4, dtype=np.float32))
    vv, uu = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    depth = jnp.asarray(2.0 + 0.4 * np.sin(uu / 19.0) + 0.3 * vv / H)
    img_np = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    img = jnp.asarray(img_np)
    img_ds = jnp.asarray(np.ascontiguousarray(img_np[::ds, ::ds]))

    seg = jnp.asarray(rng.integers(-1, M, (H, W)).astype(np.int32))
    bmaps = jnp.asarray(rng.random((M, H, W)) > 0.7)
    valid = jnp.ones(M, bool)
    kw = dict(match_distance_th=0.05, track_th=20, use_depth_filter=True,
              unbounded_top_k=True, k_pooling=3, downscale=ds,
              insert_match_th=0.03)

    def run(image):
        st = map_insert_frame(init_map_state(N), img, depth, c2w, K,
                              k_pooling=3, downscale=ds, match_th=0.03)
        return association.associate_and_insert_keyframe(
            st, init_instance_store(Kcap, 16), seg, bmaps, valid, image,
            depth, c2w, K, jnp.asarray(3, jnp.int32), **kw)

    s1, st1, m1 = run(img)
    s2, st2, m2 = run(img_ds)
    n = int(s1.count)
    assert n == int(s2.count)
    np.testing.assert_array_equal(np.asarray(s1.colors[:n]),
                                  np.asarray(s2.colors[:n]))
    np.testing.assert_array_equal(np.asarray(s1.obj_ids), np.asarray(s2.obj_ids))
    np.testing.assert_array_equal(np.asarray(m1.ins_ids), np.asarray(m2.ins_ids))


def test_active_cols_bucket_bit_exact(rng):
    """The vote-matrix column bucket (active_cols >= next_id) is
    bit-identical to the unbucketed program, including minting past the
    bucket within a call (the next call then uses a bigger bucket)."""
    K, depth, seg, bmaps, valid = synthetic_frame(rng, n_masks=6)
    c2w = np.eye(4, dtype=np.float32)
    pts, uu, vv = points_from_depth(depth, K, c2w)
    n = pts.shape[0]
    obj0 = np.full(n, -1, np.int32)
    obj0[:n // 3] = rng.integers(0, 3, n // 3)   # some pre-assigned ids < 8

    def run(active_cols):
        ms = init_map_state(4096)
        ms = MapState(points=ms.points.at[:n].set(pts),
                      point_ids=ms.point_ids.at[:n].set(
                          np.arange(n, dtype=np.int32)),
                      obj_ids=ms.obj_ids.at[:n].set(obj0),
                      colors=ms.colors, count=jnp.asarray(n, jnp.int32),
                      next_point_id=jnp.asarray(n, jnp.int32))
        store = init_instance_store(K_CAP, clip_dim=8)
        store = inst_mod.mint_instances(store, jnp.asarray(3, jnp.int32))
        ms, store, match = association.associate_keyframe(
            ms, store, jnp.asarray(seg), jnp.asarray(bmaps),
            jnp.asarray(valid), jnp.asarray(depth), jnp.asarray(c2w),
            jnp.asarray(K), jnp.asarray(0, jnp.int32),
            match_distance_th=0.05, track_th=50,
            active_cols=active_cols)
        return (np.asarray(ms.obj_ids), np.asarray(match.ins_ids),
                int(store.next_id))

    ref = run(None)
    # bucket of 8 (>= next_id 3): minted ids may exceed 8 -- still exact
    got = run(8)
    np.testing.assert_array_equal(ref[0], got[0])
    np.testing.assert_array_equal(ref[1], got[1])
    assert ref[2] == got[2]

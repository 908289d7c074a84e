"""Instance-store growth past its initial capacity.

The reference mints instances unbounded into a Python dict
(/root/reference/ovo/entities/ovo.py:271-276); the TPU store is a fixed id
space, so SemanticMapper grows it in power-of-2 buckets BEFORE a keyframe
could overflow. These tests pin: growth preserves state, growth prevents any
mask drop, and WITHOUT growth drops are counted and surfaced (not silent).
"""
import numpy as np
import jax.numpy as jnp

from ovo_tpu.mapping import instances as inst_mod
from ovo_tpu.mapping.instances import (grow_instance_store,
                                       init_instance_store)
from ovo_tpu.mapping.map_state import MapState, init_map_state
from ovo_tpu.mapping.semantic import SemanticMapper

from test_association import (make_cam, points_from_depth,  # noqa: F401
                              synthetic_frame, H, W, M_MAX)


def test_grow_preserves_state():
    rng = np.random.default_rng(0)
    store = init_instance_store(8, clip_dim=16, n_slots=4,
                                store_slot_descs=True)
    store = inst_mod.mint_instances(store, jnp.asarray(5, jnp.int32))
    ids = jnp.asarray([0, 1, 2, 4, -1], jnp.int32)
    descs = jnp.asarray(rng.normal(size=(5, 16)), jnp.float32)
    valid = jnp.asarray([True, True, True, True, False])
    store = inst_mod.add_top_kf(store, ids, jnp.asarray(3, jnp.int32),
                                jnp.asarray([10, 20, 30, 40, 1], jnp.int32),
                                valid)
    store = inst_mod.update_descriptors(
        jax_copy(store), ids, descs, jnp.asarray(3, jnp.int32), valid,
        fusion="l1_medoid")

    grown = grow_instance_store(store, 32)
    assert grown.capacity == 32
    assert int(grown.next_id) == 5
    np.testing.assert_array_equal(np.asarray(grown.active[:8]),
                                  np.asarray(store.active))
    np.testing.assert_array_equal(np.asarray(grown.clip_feature[:8]),
                                  np.asarray(store.clip_feature))
    np.testing.assert_array_equal(np.asarray(grown.top_kf[:8]),
                                  np.asarray(store.top_kf))
    np.testing.assert_array_equal(np.asarray(grown.slot_desc[:8]),
                                  np.asarray(store.slot_desc))
    # new rows are empty
    assert not np.asarray(grown.active[8:]).any()
    assert (np.asarray(grown.top_kf[8:]) == -1).all()
    # no-op growth returns the same store
    assert grow_instance_store(store, 8) is store


def jax_copy(tree):
    import jax

    return jax.tree_util.tree_map(jnp.copy, tree)


def _make_mapper(n_instances, grow):
    return SemanticMapper(
        {"capacity": {"n_instances": n_instances, "grow_instances": grow},
         "clip": {"k_top_views": 10000, "fusion": "avg_pooling",
                  "clip_dim": 8},
         "log": False},
        cam_intrinsics=make_cam())


def _drive_keyframes(sm, n_kf=3):
    """Each keyframe sees only fresh unassigned points (obj ids reset
    between frames), so every valid mask mints a new instance."""
    rng = np.random.default_rng(1)
    K, depth, seg, bmaps, valid = synthetic_frame(rng, n_masks=6)
    c2w = np.eye(4, dtype=np.float32)
    pts, _, _ = points_from_depth(depth, K, c2w)
    n = pts.shape[0]
    ms = init_map_state(4096)
    ms = MapState(
        points=ms.points.at[:n].set(pts),
        point_ids=ms.point_ids.at[:n].set(np.arange(n, dtype=np.int32)),
        obj_ids=ms.obj_ids, colors=ms.colors,
        count=jnp.asarray(n, jnp.int32),
        next_point_id=jnp.asarray(n, jnp.int32))
    img = np.zeros((H, W, 3), np.uint8)
    for kf in range(n_kf):
        ms = ms._replace(obj_ids=jnp.full((ms.capacity,), -1, jnp.int32))
        out = sm._associate(kf, img, depth, (), c2w, jnp.asarray(seg),
                            jnp.asarray(bmaps), jnp.asarray(valid), ms, 0.0)
        assert out is not None
        ms = out
    return sm


def test_mapper_grows_store_no_drops():
    sm = _drive_keyframes(_make_mapper(4, grow=True))
    # 3 keyframes x 6 masks = 18 minted instances, far past the initial 4
    assert int(sm.store.next_id) == 18
    assert sm.store.capacity >= 18
    assert sm.n_dropped_masks_total() == 0
    # minted ids are active and stable
    assert np.asarray(sm.store.active[:18]).all()


def test_fixed_capacity_counts_drops():
    sm = _drive_keyframes(_make_mapper(4, grow=False))
    assert sm.store.capacity == 4
    assert int(sm.store.next_id) == 4
    # 18 candidate mints - 4 capacity = 14 masks dropped, all counted
    assert sm.n_dropped_masks_total() == 14


def test_optimistic_empty_mask_keyframe(capsys):
    """Device mask sources skip the pre-association validity sync (the
    r5 online de-sync): a keyframe with ZERO valid masks still dispatches
    association, which must be a no-op on instance state, and the
    'No mask segmented' warning surfaces one keyframe late via
    _drain_async."""
    sm = _make_mapper(16, grow=True)
    rng = np.random.default_rng(1)
    K, depth, seg, bmaps, valid = synthetic_frame(rng, n_masks=6)
    c2w = np.eye(4, dtype=np.float32)
    pts, _, _ = points_from_depth(depth, K, c2w)
    n = pts.shape[0]
    ms = init_map_state(4096)
    ms = MapState(points=ms.points.at[:n].set(pts),
                  point_ids=ms.point_ids.at[:n].set(
                      np.arange(n, dtype=np.int32)),
                  obj_ids=ms.obj_ids, colors=ms.colors,
                  count=jnp.asarray(n, jnp.int32),
                  next_point_id=jnp.asarray(n, jnp.int32))
    img = np.zeros((H, W, 3), np.uint8)

    class EmptyMaskSource:
        def get_masks(self, image, frame_id):
            # jnp (device-typed) outputs -> the optimistic branch
            return (jnp.full((H, W), -1, jnp.int32),
                    jnp.zeros((M_MAX, H, W), bool),
                    jnp.zeros((M_MAX,), bool))

    sm.mask_source = EmptyMaskSource()
    out = sm.detect_and_track_objects((0, img, depth, ()), ms, c2w)
    assert out is not None              # optimistic: association ran
    assert int(sm.store.next_id) == 0   # ...as a no-op (nothing minted)
    assert not np.asarray(sm.store.active).any()
    assert len(sm.keyframes_queue) == 1
    # warning is deferred to the next keyframe's drain
    sm.mask_source = None
    valid_dev = jnp.asarray(valid)
    out2 = sm._associate(1, img, depth, (), c2w, jnp.asarray(seg),
                         jnp.asarray(bmaps), valid_dev, out, 0.0)
    assert out2 is not None
    assert "No mask segmented in 0!" in capsys.readouterr().out
    # the empty keyframe flows through the CLIP queue as a no-op too
    class NullEmbedder:
        clip_dim = 8
        def embed_masks(self, image, maps, keep):
            return jnp.zeros((maps.shape[0], 8), jnp.float32)
    sm.embedder = NullEmbedder()
    sm.complete_semantic_info()
    assert int(sm.store.desc_cnt.sum()) == int(
        np.asarray(sm.store.desc_cnt[:18]).sum())  # finite, no crash

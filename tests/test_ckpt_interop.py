"""Two-way debug_info checkpoint interop with the reference layout.

The reference debug checkpoint (ovo.py:529-576 + instance3d.py:191-242)
stores, besides the per-instance fused CLIP features, per-instance
``keyframes_ids`` / ``points_ids`` / ``top_kfs``, the stacked per-keyframe
``ins_map`` snapshots, and per-(kf, instance) ``kf_<i>_ins3d_<j>_clips``
descriptors. These tests pin both directions:

  1. a reference-restore ORACLE (faithful re-expression of
     OVO.restore_dict + Instance3D.restore) consumes OUR debug capture;
  2. our SemanticMapper.restore_dict consumes a hand-built
     reference-layout checkpoint, including the legacy ``gaussian_params``
     container key and ``old_restore`` ``default_<id>_*`` keys.
"""
import numpy as np
import pytest

from ovo_tpu.data.masks import CallableMaskSource, RecordedEmbedder
from ovo_tpu.mapping.pipeline import OVOSemMap
from ovo_tpu.mapping.semantic import SemanticMapper
from ovo_tpu.utils import io as io_utils

from synthetic_scene import (CLASSES, SyntheticWallDataset, class_embeddings,
                             mask_label_fn, synthetic_mask_fn)
from test_pipeline_e2e import make_config


# ---------------------------------------------------------------------------
# Reference restore oracle: OVO.restore_dict (ovo.py:551-576) +
# Instance3D.restore (instance3d.py:214-228), re-expressed faithfully
# ---------------------------------------------------------------------------

class _RefInstance:
    def __init__(self, iid):
        self.id = int(iid)
        self.clip_feature = None
        self.clip_feature_kf = None
        self.kfs_ids = []
        self.points_ids = []
        self.top_kf = []

    def restore(self, obj_dict, debug_info):
        self.clip_feature = obj_dict[f"ins3d_{self.id}_clip_feature"]
        self.clip_feature_kf = obj_dict.get(
            f"ins3d_{self.id}_clip_feature_kf", None)
        self.to_update = self.clip_feature is None
        if debug_info:
            self.kfs_ids = obj_dict[
                f"ins3d_{self.id}_keyframes_ids"].tolist()
            self.points_ids = obj_dict[
                f"ins3d_{self.id}_points_ids"].tolist()
            if obj_dict.get(f"ins3d_{self.id}_top_kfs", None) is not None:
                self.top_kf = [(area, kf_id) for area, kf_id in
                               obj_dict[f"ins3d_{self.id}_top_kfs"]]


def reference_restore_oracle(scene_dict, debug_info):
    objects = {}
    keyframes = {"frame_id": [], "ins_maps": [], "ins_descriptors": {}}
    for i in scene_dict["ins_3d_ids"]:
        obj = _RefInstance(i)
        obj.restore(scene_dict, debug_info)
        objects[obj.id] = obj
    if debug_info:
        keyframes["frame_id"] = list(scene_dict["frame_id"])
        keyframes["ins_maps"] = [
            x.squeeze() for x in np.split(scene_dict["ins_map"],
                                          len(keyframes["frame_id"]))]
        for i in range(len(keyframes["frame_id"])):
            keyframes["ins_descriptors"][i] = {}
            for ins_id in objects.keys():
                d = scene_dict.get(f"kf_{i}_ins3d_{ins_id}_clips", None)
                if d is not None:
                    keyframes["ins_descriptors"][i][ins_id] = np.asarray(d)
    return objects, keyframes


# ---------------------------------------------------------------------------
# A short debug-mode pipeline run shared by the tests
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def debug_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("debug_run")
    cfg = make_config()
    cfg["debug"] = True          # export debug keys (ovomapping.py:90)
    cfg["debug_info"] = True     # record per-kf state (ovomapping.py:58)
    ds = SyntheticWallDataset(n_frames=12)
    embeds = class_embeddings(16)
    text_embeds = {c: embeds[i] for i, c in enumerate(CLASSES)}
    text_embeds.update({f"This is a photo of a {c}": embeds[i]
                        for i, c in enumerate(CLASSES)})
    embedder = RecordedEmbedder(16, mask_label_fn, embeds, text_embeds)
    mask_source = CallableMaskSource(synthetic_mask_fn, max_masks=16)
    sem_map = OVOSemMap(cfg, out, mask_source=mask_source,
                        embedder=embedder, dataset=ds)
    sem_map.run()
    return sem_map, out


def test_debug_capture_has_reference_layout(debug_run):
    sem_map, out = debug_run
    ckpt = io_utils.load_ckpt(out / "ovo_map.ckpt")
    d = ckpt["ovo_map_params"]
    ids = np.asarray(d["ins_3d_ids"])
    assert len(ids) > 0
    n_kf = len(np.asarray(d["frame_id"]))
    assert n_kf == sem_map.ovo.kf_id
    # stacked ins_map snapshots, one per keyframe, at image resolution
    ins_map = np.asarray(d["ins_map"])
    assert ins_map.shape[0] == n_kf
    assert ins_map.shape[1:] == sem_map.dataset[0][1].shape[:2]
    for i in ids:
        assert f"ins3d_{i}_clip_feature" in d
        kfs = np.asarray(d[f"ins3d_{i}_keyframes_ids"])
        tops = np.asarray(d[f"ins3d_{i}_top_kfs"]).reshape(-1, 2)
        pts = np.asarray(d[f"ins3d_{i}_points_ids"])
        assert len(kfs) > 0
        # every top-kf pair refers to a keyframe the instance matched
        assert set(tops[:, 1].tolist()) <= set(kfs.tolist())
        # unbounded k_top_views (config 10000): every matched kf is top
        assert len(tops) == len(kfs)
        # points_ids come from the map's point->instance assignment
        obj_ids = np.asarray(ckpt["map_params"]["obj_ids"]).reshape(-1)
        assert len(pts) == int((obj_ids == i).sum())
    # per-(kf, instance) descriptors exist for computed keyframes
    clip_keys = [k for k in d if k.startswith("kf_") and k.endswith("_clips")]
    assert clip_keys, "no per-(kf, instance) descriptors captured"


def test_reference_oracle_consumes_our_debug_ckpt(debug_run):
    sem_map, out = debug_run
    ckpt = io_utils.load_ckpt(out / "ovo_map.ckpt")
    d = ckpt["ovo_map_params"]
    objects, keyframes = reference_restore_oracle(d, debug_info=True)

    ids = sem_map.ovo.active_ids()
    assert sorted(objects) == sorted(int(i) for i in ids)
    feats = np.asarray(sem_map.ovo.store.clip_feature)
    for i, obj in objects.items():
        if obj.clip_feature is not None:
            np.testing.assert_array_equal(np.asarray(obj.clip_feature),
                                          feats[i])
        if obj.top_kf:  # stored pairs satisfy the heap invariant (root=min)
            assert tuple(obj.top_kf[0]) == tuple(min(obj.top_kf))
    # reference splits ins_map back into one snapshot per keyframe
    assert len(keyframes["ins_maps"]) == sem_map.ovo.kf_id
    assert keyframes["ins_maps"][0].shape == \
        sem_map.dataset[0][1].shape[:2]
    # descriptors keyed [kf][ins] and bit-equal to the store's records
    total = sum(len(v) for v in keyframes["ins_descriptors"].values())
    assert total == sum(
        int(np.asarray(keep).sum())
        for _, _, keep in sem_map.ovo.kf_descriptors.values())


def test_our_restore_roundtrips_debug_ckpt(debug_run):
    """capture -> torch container -> restore -> capture is stable on every
    debug key (the restore rebuilds kf_records/kf_descriptors/ins_maps)."""
    sem_map, out = debug_run
    ckpt = io_utils.load_ckpt(out / "ovo_map.ckpt")
    d = ckpt["ovo_map_params"]

    ovo2 = SemanticMapper(make_config()["semantic"], eval=True,
                          embedder=sem_map.ovo.embedder)
    ovo2.restore_dict(d, debug_info=True)
    d2 = ovo2.capture_dict(debug_info=True, map_dict=ckpt["map_params"])

    assert sorted(d2) == sorted(d)
    for k in d:
        a, b = d[k], d2[k]
        if a is None:
            assert b is None, k
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=k)
    # streaming fusion state is reconstructed from the per-kf clips
    cnt1 = np.asarray(sem_map.ovo.store.desc_cnt)
    cnt2 = np.asarray(ovo2.store.desc_cnt)
    ids = sem_map.ovo.active_ids()
    np.testing.assert_array_equal(cnt1[ids], cnt2[ids])


def test_our_restore_consumes_reference_built_ckpt(tmp_path):
    """Hand-build a checkpoint exactly as the reference writes it (torch
    tensors, legacy ``gaussian_params`` container key, one instance in the
    ``old_restore`` ``default_<id>_*`` layout) and assert our restore
    consumes it bit-for-bit."""
    import torch

    D = 16
    rng = np.random.default_rng(7)
    feats = {1: rng.normal(size=D).astype(np.float32),
             3: rng.normal(size=D).astype(np.float32),
             5: rng.normal(size=D).astype(np.float32)}
    clips = {(0, 1): rng.normal(size=D).astype(np.float32),
             (0, 3): rng.normal(size=D).astype(np.float32),
             (1, 1): rng.normal(size=D).astype(np.float32)}
    ins_maps = rng.integers(-1, 6, size=(2, 12, 10)).astype(np.int32)

    scene = {"ins_3d_ids": np.array([1, 3, 5])}
    for i, f in feats.items():
        if i == 5:  # old_restore layout (instance3d.py:229-242)
            scene[f"default_{i}_clip_feature"] = torch.from_numpy(f)
            scene[f"default_{i}_keyframes_ids"] = np.array([1])
            scene[f"default_{i}_points_ids"] = np.array([40, 41])
            scene[f"default_{i}_top_kfs"] = np.array([[30, 1]])
        else:
            scene[f"ins3d_{i}_clip_feature"] = torch.from_numpy(f)
            scene[f"ins3d_{i}_clip_feature_kf"] = 0
            scene[f"ins3d_{i}_keyframes_ids"] = np.array(
                [0, 1] if i == 1 else [0])
            scene[f"ins3d_{i}_points_ids"] = np.arange(10 * i)
            scene[f"ins3d_{i}_top_kfs"] = np.array(
                [[50, 0], [60, 1]] if i == 1 else [[20, 0]])
    scene["frame_id"] = np.array([0, 2])
    scene["ins_map"] = ins_maps
    for (kf, i), c in clips.items():
        scene[f"kf_{kf}_ins3d_{i}_clips"] = torch.from_numpy(c)

    ckpt = {"gaussian_params": {"xyz": np.zeros((4, 3), np.float32),
                                "obj_ids": np.array([1, 1, 3, 5]),
                                "ids": np.arange(4)},
            "ovo_map_params": scene}
    torch.save(ckpt, tmp_path / "ovo_map.ckpt")

    loaded = io_utils.load_ckpt(tmp_path / "ovo_map.ckpt")
    # the legacy container key resolves like run_eval.load_representation
    map_params = loaded.get("map_params") or loaded["gaussian_params"]
    assert map_params["xyz"].shape == (4, 3)

    cfg = make_config()["semantic"]
    ovo = SemanticMapper(cfg, eval=True)
    ovo.restore_dict(loaded["ovo_map_params"], debug_info=True)

    assert sorted(ovo.active_ids().tolist()) == [1, 3, 5]
    store_feats = np.asarray(ovo.store.clip_feature)
    for i, f in feats.items():
        np.testing.assert_array_equal(store_feats[i], f)
    assert ovo.frame_ids == [0, 2]
    assert ovo.kf_id == 2
    # per-kf descriptor records rebuilt (kf 0: ins 1+3; kf 1: ins 1)
    assert set(ovo.kf_descriptors) == {0, 1}
    ids0 = np.asarray(ovo.kf_descriptors[0][0]).tolist()
    assert sorted(ids0) == [1, 3]
    # streaming fusion state implied by the per-kf clips
    cnt = np.asarray(ovo.store.desc_cnt)
    assert cnt[1] == 2 and cnt[3] == 1
    np.testing.assert_allclose(
        np.asarray(ovo.store.desc_sum)[1], clips[(0, 1)] + clips[(1, 1)],
        rtol=1e-6)
    # instance 5 (old layout, no per-kf clips) falls back to feature-as-
    # one-view so later keyframe drops stay well-defined
    assert cnt[5] == 1
    # association records: kf 0 saw ins {1, 3}, kf 1 saw ins {1, 5}
    assert sorted(ovo.kf_records[0][0].tolist()) == [1, 3]
    assert sorted(ovo.kf_records[1][0].tolist()) == [1, 5]
    # ins_map snapshots preserved for the capture round-trip
    np.testing.assert_array_equal(ovo.kf_ins_maps[0], ins_maps[0])

    # and the re-capture emits the reference keys again
    d2 = ovo.capture_dict(debug_info=True, map_dict=map_params)
    assert sorted(np.asarray(d2["ins_3d_ids"]).tolist()) == [1, 3, 5]
    np.testing.assert_array_equal(d2["ins_map"], ins_maps)
    np.testing.assert_array_equal(d2["ins3d_5_points_ids"], [3])
    assert "kf_0_ins3d_1_clips" in d2
